from featurestore_spark.transform.context import TransformationContext  # noqa: F401
from featurestore_spark.transform.pipeline import Pipeline  # noqa: F401
from featurestore_spark.transform.row import (  # noqa: F401
    AppendColumnRowTransformation,
    RowTransformationPipeline,
)
from featurestore_spark.transform.sql import (  # noqa: F401
    NamedSQLTransformation,
    SQLFileTransformation,
    SQLLoader,
    SQLResourceTransformation,
    SQLTableTransformation,
    SQLTransformation,
)
from featurestore_spark.transform.table import (  # noqa: F401
    TableTransformation,
    TableTransformationPipeline,
)
