"""wordspell_spark — a PySpark-native distributed sketch / approximate
aggregation engine with the query capabilities of cannonflesh/wordspell.

Built from scratch on public PySpark APIs (DataFrame, pandas/Arrow UDFs,
AQE); not a port of the Go reference.  See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
