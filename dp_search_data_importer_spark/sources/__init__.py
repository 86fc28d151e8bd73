from dp_search_data_importer_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_documents,
    load_table,
)
from dp_search_data_importer_spark.sources.repo_files import (  # noqa: F401
    synthetic_repo_files,
)
