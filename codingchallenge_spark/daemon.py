"""PySpark worker daemon with the engine's data plane preloaded.

Spark forks Python workers from a long-lived daemon process
(``pyspark.daemon``), but worker creation is serialized JVM-wide
(SparkEnv.createPythonWorker is a global lock) and each fresh worker pays
the heavy data-plane imports — numpy, pandas, pyarrow — serially on first
use (~350 ms each; measured 11.3s cold vs 0.65s warm for a 32-task Arrow
stage on this box). Importing those modules HERE, before the daemon starts
forking, lets every forked worker inherit them copy-on-write: cold-start
cost is paid once per executor instead of once per worker.

Enabled via ``spark.python.daemon.module=codingchallenge_spark.daemon``
(session.py sets it when the package is importable by the daemon — i.e. the
zip/source is on the workers' PYTHONPATH, which spark-submit --py-files and
the local sessions both guarantee). Imports are guarded: if anything here
fails, the daemon still starts and behaves exactly like the stock one.
"""

try:  # pragma: no cover - exercised inside forked daemon processes
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401  (Arrow UDF runner deps)
    import pyspark.worker  # noqa: F401  (the module every fork would import)

    # The engine's own kernel modules: their import pulls pyspark.sql.functions
    # (heavy), and every scoring worker deserializes closures referencing them.
    import codingchallenge_spark.functions.similarity  # noqa: F401
    import codingchallenge_spark.functions.text  # noqa: F401
except Exception:  # pragma: no cover
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
