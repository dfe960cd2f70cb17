"""fluent_plugin_detect_exceptions_spark — a from-scratch PySpark-native
batch pipeline with the query/data-processing capabilities of
GoogleCloudPlatform/fluent-plugin-detect-exceptions.

Architecture (SURVEY.md §7): transcripts scan → vectorized regex classify →
FSM-as-scan segmentation (applyInPandas, numpy function-composition) →
start-of-block flag + running-sum segment id → JVM-side ordered concat →
broadcast enrich → route/fan-out → per-sink counts.  Skewed conversations are
salt-chunked with warm-up overlap and synchronization-point detection.
"""

__version__ = "0.1.0"
