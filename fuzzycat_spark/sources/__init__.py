from fuzzycat_spark.sources.synth import synth_pages, extract_text_udf  # noqa: F401
