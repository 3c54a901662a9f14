from dl_datalake_spark.lake.manifest import ManifestManager  # noqa: F401
from dl_datalake_spark.lake.reader import LakeReader  # noqa: F401
from dl_datalake_spark.lake.writer import LakeWriter  # noqa: F401
