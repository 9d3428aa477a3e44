"""PySpark-native analytics engine reproducing the query/data-processing
capabilities of the reference repo `himanshuagrwl/Big-Data-Analytics-Mini-Projects`
(CSE 545 course projects: hand-built MapReduce simulator, multi-level samplers,
MinHash/LSH, matrix multiply, OLS hypothesis testing, item-item CF).

Everything here is re-expressed Spark-first (DataFrame / Spark SQL / Catalyst /
Structured Streaming) rather than ported: the reference's hand-physical dataflow
programs become declarative plans and Catalyst supplies the optimizer the
reference lacks. See SURVEY.md for the full blueprint.
"""

__version__ = "0.1.0"
