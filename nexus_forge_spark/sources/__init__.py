from nexus_forge_spark.sources.tables import load_table, load_tables  # noqa: F401
from nexus_forge_spark.sources.datagen import (  # noqa: F401
    flat_to_interleaved,
    synthesize_documents,
)
