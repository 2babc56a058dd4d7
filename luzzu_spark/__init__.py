"""luzzu_spark — a PySpark-native web-text quality-assessment engine.

A from-scratch re-expression of the capability surface of EIS-Bonn/Luzzu
(reference at /root/reference; see /root/repo/SURVEY.md) as an idiomatic
Spark DataFrame pipeline: Luzzu's pluggable per-quad quality metrics
(/root/reference/README.md:7,13) become a declarative registry of
vectorized column expressions + pandas/Arrow UDFs over a web-document
table; its daQ quality-metadata graph (README.md:6,8) becomes a metrics
DataFrame sink; its QPRO problem reports (README.md:9) become per-row
``drop_reasons``/``rule_scores`` columns; its dataset ranking
(README.md:15) becomes window-function ranking over quality scores.

Nothing here is a port: the reference is a single-JVM streaming Java
framework with no optimizer; this engine declares lazy DataFrame plans
and lets Catalyst + AQE pick physical strategy.
"""

__version__ = "0.1.0"
