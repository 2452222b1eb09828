"""Synthetic Record generation + size-bounded parquet writing
(SURVEY.md section 3 entry point 3; reference cmd/create-test-data/).
"""

from .records import RECORD_SCHEMA, generate_records
from .writer import rows_for_target_bytes, write_sized_parquet

__all__ = [
    "RECORD_SCHEMA",
    "generate_records",
    "rows_for_target_bytes",
    "write_sized_parquet",
]
