"""Large-scale training-data-pipeline operators on the same engine:
deduplication, similarity search, text analysis, multimodal plumbing.

These go beyond the reference's raster operators (SURVEY.md section 2) and
are designed for the 100 TB regime: everything is expressed as DataFrame
transformations with map-side-combinable aggregations, explode+equi-join
candidate generation instead of cross joins, and broadcastable small sides.
Each operator has a matching ANSI-SQL oracle (see __spark_entry__.py) so the
driver's DuckDB harness verifies results value-for-value.
"""
