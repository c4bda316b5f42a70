from process_spark.sources.io import (  # noqa: F401
    load,
    load_all,
    read_csv,
    read_json,
    read_nmea_text,
    write_json_docs,
    write_parquet,
)
