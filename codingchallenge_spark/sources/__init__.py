from codingchallenge_spark.sources.records import (
    RECORDS_SCHEMA,
    read_records,
    read_testdata_table,
)

__all__ = ["RECORDS_SCHEMA", "read_records", "read_testdata_table"]
