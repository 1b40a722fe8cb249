"""etl_cotrip_signs_spark — a PySpark-native analytics engine.

A ground-up Spark reimplementation of the capabilities of the
``dfpc-coe/etl-cotrip-signs`` reference ETL (see ``/root/reference/task.ts``),
widened into a general DataFrame/SQL analytics engine:

- reference-parity GeoJSON signs pipeline (project / multi-geometry explode /
  geometry-type filter / paginated REST source / HTTP batch sink),
- a relational core (joins, aggregations, windows, sorts, set ops),
- a scalar-function surface (string / date / JSON / array families),
- Structured Streaming operators over the ``events`` table,
- LLM-data-pipeline operators (dedup exact/MinHash/SimHash, similarity
  search, text analysis, multimodal column plumbing).

Everything is declarative DataFrame/SQL so Catalyst can push filters,
prune columns, and choose join strategies; Python UDFs appear only where
Spark's builtin operators cannot express the semantics (ragged GeoJSON
coordinate splitting, stateful streaming, fake multimodal decode).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .io import TABLES, load_table, register_views  # noqa: F401
