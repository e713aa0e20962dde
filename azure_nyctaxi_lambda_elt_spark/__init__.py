"""PySpark-native analytics/ELT engine with the capabilities of the
neelamsk/azure-nyctaxi-lambda-elt reference pipeline.

Spark-first re-expression of a lambda-architecture ELT: typed staging,
clean/domain-filter slices, deterministic latest-wins dedupe, star-schema
dimensional modeling with SHA-256 surrogate keys, DQ gates, DLQ routing,
a Structured Streaming speed lane, and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB-scale execution.
"""

__version__ = "0.1.0"
