"""Custom data sources — the extensibility half of the scan surface
(SURVEY.md §2B scans row; io.py covers the built-in formats).

Spark 4's Python DataSource API lets a source live entirely in Python while
still scanning in parallel (one task per InputPartition).  The sortbench
source regenerates the reference's workload tables natively — the same
rows as generators.py's portable mode, proven by differential tests against
both the JVM expression generator and a DuckDB md5 replay."""

from experiments_datafusion_spark.sources.avro_source import PyAvroDataSource
from experiments_datafusion_spark.sources.sortbench_source import (
    SortbenchDataSource,
    register_sources,
)

__all__ = ["PyAvroDataSource", "SortbenchDataSource", "register_sources"]
