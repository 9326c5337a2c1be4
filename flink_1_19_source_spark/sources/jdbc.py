"""JDBC table source / lookup / upsert sink (SURVEY §2.1 S8, §2.4 J7).

Flink 1.19's JDBC connector surface (flink-connector-jdbc docs):

- **bounded scan** with ``scan.partition.column/num/lower/upper-bound``
  → Spark's JDBC data source with ``partitionColumn/numPartitions/
  lowerBound/upperBound`` — same parallel-read contract, and Spark
  additionally pushes filters into the remote SQL (``PushedFilters`` shows
  in the scan node);
- **lookup join** (``FOR SYSTEM_TIME AS OF proc_time``) with
  ``lookup.cache`` → scan the dim once per (re)fresh and broadcast it into
  the probe side — Flink's cache=ALL mode, the only shape that scales past
  per-row remote RPCs;
- **upsert sink** keyed on the primary key → set-based staging + ``MERGE``:
  each batch is written to a staging table through the JDBC writer, then a
  single MERGE statement applies it to the target — never row-at-a-time
  driver JDBC.

Backend: any JDBC URL Spark's data source can reach. The test/default
backend is the **Apache Derby embedded engine that ships in Spark's own
jars** (derby-10.16 — present for the Hive metastore), so the whole
surface runs with zero external services; swap ``url``/``driver`` for
Postgres/MySQL in production and pass credentials via ``properties``
(user/password reach both Spark's reader/writer and the driver-side
control connection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _quiet_derby(spark: SparkSession) -> None:
    """Keep Derby from dropping derby.log into the CWD, and run the
    embedded engine with ``derby.system.durability=test`` (documented
    Derby knob: skip transaction-log fsyncs).  Embedded Derby here is
    the zero-service TEST backend — its per-commit fsync is pure
    harness floor (measured 1-2.6 s per replayed stream), and the
    crash pins inject in-process exceptions, not JVM kills, so every
    exactly-once / replay contract still holds.  A production
    deployment swaps the URL for a network warehouse where this
    property does not exist.  Must be set before the engine boots;
    both are idempotent afterwards."""
    jvm = spark.sparkContext._jvm
    jvm.java.lang.System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    jvm.java.lang.System.setProperty("derby.system.durability", "test")


#: Driver-side control connections, pooled per (url, properties).  A
#: micro-batch sink issues several control statements per batch (ledger
#: probe, MERGE, staging maintenance, ledger mark); opening a fresh
#: connection for each was a measurable slice of the per-batch floor.
#: Bounded FIFO: streaming queries mint per-run database URLs, so stale
#: entries are evicted (and closed) rather than accumulating for hours.
_CONN_POOL: dict = {}
_CONN_POOL_MAX = 16


def _pooled_connection(jvm, url: str, driver: str, properties: dict):
    key = (url, tuple(sorted(properties.items())))
    conn = _CONN_POOL.get(key)
    if conn is not None:
        try:
            if not conn.isClosed():
                return conn
        except Exception:
            pass
        _CONN_POOL.pop(key, None)
    jvm.java.lang.Class.forName(driver)
    jprops = jvm.java.util.Properties()
    for k, v in properties.items():
        jprops.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    while len(_CONN_POOL) >= _CONN_POOL_MAX:
        # dicts preserve insertion order, so the first key is the oldest
        # entry — evicting it (not popitem()'s LIFO tail) is what makes
        # this FIFO: stale per-run Derby databases get closed instead of
        # pinning the embedded engine for the life of the driver.
        oldest = next(iter(_CONN_POOL))
        old = _CONN_POOL.pop(oldest)
        try:
            old.close()
        except Exception:
            pass
    _CONN_POOL[key] = conn
    return conn


class JdbcTableSource:
    """One JDBC table behind Flink's S8 contract (scan / lookup / upsert)."""

    def __init__(
        self,
        url: str,
        table: str,
        driver: str = DERBY_DRIVER,
        partition_column: str | None = None,
        num_partitions: int | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        properties: dict[str, str] | None = None,
        column_types: dict[str, str] | None = None,
        staging_partitions: int = 1,
    ):
        self.url = url
        self.table = table
        self.driver = driver
        self.partition_column = partition_column
        self.num_partitions = num_partitions
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound
        #: extra JDBC connection properties (user/password for authed
        #: backends) — forwarded to Spark reads/writes AND _execute
        self.properties = dict(properties or {})
        #: column → SQL type overrides for CREATE TABLE (Spark's Derby
        #: dialect maps StringType→CLOB, which Derby cannot compare in a
        #: MERGE ON/WHEN clause — force VARCHAR for any string key column)
        self.column_types = dict(column_types or {})
        #: upsert staging writer count (see upsert docstring)
        self.staging_partitions = staging_partitions

    @property
    def _props(self) -> dict:
        return {"driver": self.driver, **self.properties}

    def _writer(self, df: DataFrame):
        w = df.write
        types = {c: t for c, t in self.column_types.items() if c in df.columns}
        if types:
            w = w.option(
                "createTableColumnTypes",
                ", ".join(f"{c} {t}" for c, t in types.items()),
            )
        return w

    # -- scan ------------------------------------------------------------
    def scan(self, spark: SparkSession) -> DataFrame:
        """Bounded scan. With a partition column configured this issues
        ``num_partitions`` range-bounded remote queries in parallel (the
        scale path — a single unpartitioned JDBC read is one task no matter
        the cluster size). Filters/projections applied on the returned
        DataFrame push into the remote SQL (Catalyst JDBC pushdown)."""
        _quiet_derby(spark)
        r = spark.read.format("jdbc").option("url", self.url).option(
            "dbtable", self.table
        ).option("driver", self.driver)
        if self.partition_column is not None:
            r = (
                r.option("partitionColumn", self.partition_column)
                .option("numPartitions", self.num_partitions or 4)
                .option("lowerBound", self.lower_bound or 0)
                .option("upperBound", self.upper_bound or 1)
            )
        return r.load()

    # -- lookup join (J7 over JDBC) --------------------------------------
    def lookup_join(
        self, fact: DataFrame, on: list[str] | str, how: str = "inner"
    ) -> DataFrame:
        """Flink lookup join with lookup.cache=ALL: the dimension is read
        once and broadcast to every probe task — no per-row remote query.
        Re-invoke per micro-batch for the refresh-on-interval behavior
        (stream-static join re-executes the static plan each batch)."""
        spark = fact.sparkSession
        return fact.join(F.broadcast(self.scan(spark)), on, how)

    # -- write / upsert ---------------------------------------------------
    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        """Plain JDBC write (append/overwrite) — table auto-created."""
        _quiet_derby(df.sparkSession)
        self._writer(df).jdbc(self.url, self.table, mode=mode, properties=self._props)

    def ensure_table(self, schema_df: DataFrame, overwrite: bool = False) -> None:
        """Create the target table from ``schema_df``'s schema, writing zero
        rows. ``overwrite=False`` leaves an existing table untouched (JDBC
        mode=ignore); ``overwrite=True`` drops and recreates — the clean-
        slate a MERGE-sink streaming query wants at start-of-run."""
        _quiet_derby(schema_df.sparkSession)
        self._writer(schema_df.limit(0)).jdbc(
            self.url,
            self.table,
            mode="overwrite" if overwrite else "ignore",
            properties=self._props,
        )

    def upsert(
        self, df: DataFrame, pk_cols: list[str], op_col: str | None = None,
        delete_kind: str = "-D",
    ) -> None:
        """Set-based upsert: stage the batch via the parallel JDBC writer,
        then ONE ``MERGE`` statement applies it to the target keyed on the
        primary key. This is the Flink JDBC upsert-sink semantic done the
        warehouse way — O(1) statements per batch, not O(rows) — and the
        same staging+MERGE shape works on any MERGE-capable backend
        (Derby ≥ 10.11, Postgres 15+, …).

        With ``op_col`` set the MERGE consumes a changelog (X6): staged rows
        whose op equals ``delete_kind`` DELETE the matched target row;
        everything else upserts. The op column itself is never written to
        the target.

        The target gets a UNIQUE index on ``pk_cols`` on first use
        (idempotent): Derby executes an un-indexed MERGE as a nested
        loop — quadratic in table size, observed 100x slower at 100k
        rows — and a keyed MERGE target is the correct contract anyway
        (the same index a Postgres upsert sink would require).

        Staging parallelism: embedded Derby serializes concurrent
        writers on table latches — 8 partitions inserting 270k rows
        measured 4.1 s vs 1.1 s for one writer with a large JDBC batch,
        so the stage lands through ``staging_partitions`` (default 1)
        writers after a repartition (upstream compute stays parallel; a
        network warehouse backend raises the knob)."""
        spark = df.sparkSession
        staging = f"{self.table}_STAGE"
        _quiet_derby(spark)
        self._ensure_pk_index(spark, pk_cols)
        self._writer(df.repartition(self.staging_partitions)).option(
            "batchsize", "50000"
        ).jdbc(self.url, staging, mode="overwrite", properties=self._props)

        cols = [c for c in df.columns if c != op_col]
        non_pk = [c for c in cols if c not in pk_cols]
        on = " AND ".join(f't."{c}" = s."{c}"' for c in pk_cols)
        set_clause = ", ".join(f't."{c}" = s."{c}"' for c in non_pk)
        ins_cols = ", ".join(f'"{c}"' for c in cols)
        ins_vals = ", ".join(f's."{c}"' for c in cols)
        if op_col is None:
            merge = (
                f'MERGE INTO {self.table} t USING {staging} s ON {on} '
                f"WHEN MATCHED THEN UPDATE SET {set_clause} "
                f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
            )
        else:
            merge = (
                f'MERGE INTO {self.table} t USING {staging} s ON {on} '
                f"WHEN MATCHED AND s.\"{op_col}\" = '{delete_kind}' THEN DELETE "
                f"WHEN MATCHED THEN UPDATE SET {set_clause} "
                f"WHEN NOT MATCHED AND s.\"{op_col}\" <> '{delete_kind}' "
                f"THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
            )
        self._execute(spark, merge)
        self._execute(spark, f"DROP TABLE {staging}")

    def _ensure_pk_index(self, spark: SparkSession, pk_cols: list[str]) -> None:
        """Idempotently create the MERGE key's unique index (see upsert)."""
        key = tuple(pk_cols)
        done = getattr(self, "_pk_indexed", None)
        if done is None:
            done = self._pk_indexed = set()
        if key in done:
            return
        cols = ", ".join(f'"{c}"' for c in pk_cols)
        try:
            self._execute(
                spark,
                f"CREATE UNIQUE INDEX {self.table}_PKIX ON {self.table} ({cols})",
            )
        except Exception as e:  # index (or name) already exists — fine
            if "already" not in str(e) and "X0Y32" not in str(e):
                raise
        done.add(key)

    def _execute(self, spark: SparkSession, sql: str) -> None:
        """Run one DDL/DML statement on the backend through the pooled
        driver-side JDBC connection (py4j → java.sql) — control statements
        only, never row data. Connection properties are forwarded."""
        conn = _pooled_connection(
            spark.sparkContext._jvm, self.url, self.driver, self.properties
        )
        st = conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()

    def query_scalar(self, spark: SparkSession, sql: str):
        """Run one scalar SELECT on the pooled control connection and
        return the first row's first column (None if no rows).  The fast
        path for control-plane probes (batch-ledger membership, row
        counts) that a full Spark JDBC scan would overplan by ~1000x."""
        conn = _pooled_connection(
            spark.sparkContext._jvm, self.url, self.driver, self.properties
        )
        st = conn.createStatement()
        try:
            rs = st.executeQuery(sql)
            try:
                return rs.getObject(1) if rs.next() else None
            finally:
                rs.close()
        finally:
            st.close()


def derby_url(db_dir: str) -> str:
    return f"jdbc:derby:{db_dir};create=true"


def seed_from_parquet(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    db_dir: str,
    table: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
) -> JdbcTableSource:
    """Load ``sf_dir/name.parquet`` into the embedded-Derby table (idempotent
    overwrite) and return its JdbcTableSource — the test stand-in for a DBA-
    managed production table."""
    from ..tables import load_table

    src = JdbcTableSource(
        derby_url(db_dir),
        (table or name).upper(),
        partition_column=partition_column,
        num_partitions=num_partitions,
    )
    df = load_table(spark, sf_dir, name)
    if partition_column is not None:
        bounds = df.agg(
            F.min(partition_column).alias("lo"), F.max(partition_column).alias("hi")
        ).first()
        src.lower_bound = int(bounds["lo"])
        src.upper_bound = int(bounds["hi"]) + 1
    src.write(df, mode="overwrite")
    return src
