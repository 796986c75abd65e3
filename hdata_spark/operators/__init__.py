from hdata_spark.operators.dedup import lww_latest, lww_latest_window
from hdata_spark.operators.partitioning import (
    build_salt_map,
    with_bucket,
    with_salt,
)
