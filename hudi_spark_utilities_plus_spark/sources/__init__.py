"""Source connectors: excel/csv/json/parquet file readers + thin
option-forwarding jdbc/mongo/es connectors behind one registry."""

from .excel import read_excel
from .registry import SOURCES, read_source, validate_jdbc_url

__all__ = ["read_excel", "read_source", "SOURCES", "validate_jdbc_url"]
