"""Typed ingestion: all-string scans + scalable column type inference
(reference: resources/convertors/* — see each module's docstring)."""

from .infer import ColumnPlan, infer_and_cast, infer_plan
from .readers import read_csv_inferred, read_json_flat, flatten_structs

__all__ = [
    "ColumnPlan",
    "infer_and_cast",
    "infer_plan",
    "read_csv_inferred",
    "read_json_flat",
    "flatten_structs",
]
