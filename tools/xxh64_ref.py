"""Thin alias: the pure-Python XXH64 reference lives in the package
(etl_cotrip_signs_spark/functions/xxh64_ref.py) so operator modules can
bake chain seeds at import time without needing the repo root on sys.path."""

from etl_cotrip_signs_spark.functions.xxh64_ref import (  # noqa: F401
    xxh64,
    xxh64_signed,
)
