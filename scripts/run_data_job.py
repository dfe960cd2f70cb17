"""spark-submit wrapper for the corpus-preparation job.

    python scripts/make_pyfiles.py
    spark-submit --py-files dist/fluent_plugin_detect_exceptions_spark.zip \
        scripts/run_data_job.py --input documents/ --output prepared/ \
        [--eval benchmarks/] [--rate src=millis ...] [job flags]
"""

from fluent_plugin_detect_exceptions_spark.data_job import main

if __name__ == "__main__":
    main()
