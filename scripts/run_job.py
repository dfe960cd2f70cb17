"""spark-submit wrapper: ships the packaged library and runs the job.

    python scripts/make_pyfiles.py
    spark-submit --py-files dist/fluent_plugin_detect_exceptions_spark.zip \
        scripts/run_job.py --input ... --output ... [job flags]
"""

from fluent_plugin_detect_exceptions_spark.job import main

if __name__ == "__main__":
    main()
