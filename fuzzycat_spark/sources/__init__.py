from fuzzycat_spark.sources.synth import synth_pages, extract_text_udf  # noqa: F401
from fuzzycat_spark.sources.warc import read_warc, stream_warc, warc_pages  # noqa: F401
from fuzzycat_spark.sources.tables import (  # noqa: F401
    iceberg_session_conf,
    is_table_identifier,
    read_pages,
    write_output,
)
