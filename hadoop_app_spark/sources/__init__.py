from hadoop_app_spark.sources.ncdc import FixedWidthField, read_fixed_width, read_ncdc
from hadoop_app_spark.sources.tsv import read_tsv
from hadoop_app_spark.sources.delim001 import read_city_cars, read_delim001_json, read_user_profiles
from hadoop_app_spark.sources.sinks import write_kv_text, write_text_lines
from hadoop_app_spark.sources.provenance import dispatch_by_path, read_tagged_parquet

__all__ = [
    "FixedWidthField",
    "read_fixed_width",
    "read_ncdc",
    "read_tsv",
    "read_delim001_json",
    "read_user_profiles",
    "read_city_cars",
    "write_kv_text",
    "write_text_lines",
    "dispatch_by_path",
    "read_tagged_parquet",
]
