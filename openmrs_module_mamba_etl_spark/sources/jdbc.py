"""JDBC source with partitioned parallel scans.

The reference reads the transactional OpenMRS MySQL database directly
(reference: pom.xml:279-280 ``-d openmrs``; README.md:123). The Spark analog
is a partitioned JDBC scan: ``partitionColumn/lowerBound/upperBound/
numPartitions`` shard the source table across executors so a large ``obs``
table is pulled in parallel instead of through one connection.

No database is available in the test environment, so this module is exercised
only for option-construction; the read path is standard ``spark.read.jdbc``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcSource:
    """Connection + parallelism spec for one JDBC table scan."""

    url: str  # e.g. jdbc:mysql://host:3306/openmrs
    user: str
    password: str
    driver: str = "com.mysql.cj.jdbc.Driver"
    fetch_size: int = 10_000
    extra: dict[str, str] = field(default_factory=dict)

    def options(
        self,
        dbtable: str,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int = 1,
    ) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": dbtable,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "fetchsize": str(self.fetch_size),
            **self.extra,
        }
        if partition_column is not None:
            if lower_bound is None or upper_bound is None:
                raise ValueError(
                    "partition_column requires lower_bound and upper_bound"
                )
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(num_partitions),
            )
        return opts

    def read(
        self,
        spark: SparkSession,
        dbtable: str,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int = 1,
    ) -> DataFrame:
        """Parallel scan of ``dbtable``; pushdown-capable (Catalyst emits
        WHERE clauses into the JDBC query for filters on the DataFrame)."""
        reader = spark.read.format("jdbc")
        for k, v in self.options(
            dbtable, partition_column, lower_bound, upper_bound, num_partitions
        ).items():
            reader = reader.option(k, v)
        return reader.load()


@dataclass(frozen=True)
class JdbcSink:
    """JDBC write-back to the analysis database.

    The reference's output target is a MySQL analysis DB the existing
    report consumers read from (reference: README.md:125; pom.xml:282-283
    ``-a analysis_db``); the engine computes on Spark but must hand the
    finished tables back over JDBC. Scale knobs:

    - ``batch_size`` → JDBC ``batchsize``: rows per INSERT batch round trip;
    - ``num_partitions`` caps concurrent connections — every partition
      opens one, and a 1000-task write would otherwise be a connection
      storm against a single-writer DB;
    - ``isolationLevel NONE/READ_COMMITTED`` avoids long write transactions;
    - ``truncate`` on overwrite keeps the DBA-managed table DDL (indexes,
      grants) instead of DROP+CREATE when supported.

    Tested against the embedded Derby engine that ships with Spark — the
    same JVM-local-DB strategy as the reference's H2 integration tests
    (reference: omod/src/test/java/.../MambaTest.java:34-41).
    """

    url: str
    user: str = ""
    password: str = ""
    driver: str = "org.apache.derby.jdbc.EmbeddedDriver"
    batch_size: int = 10_000
    isolation_level: str = "READ_COMMITTED"
    extra: dict[str, str] = field(default_factory=dict)

    def write(
        self,
        df: DataFrame,
        dbtable: str,
        mode: str = "overwrite",
        num_partitions: int | None = 8,
        truncate: bool = False,
    ) -> None:
        # cap connections; coalesce (not repartition) — no shuffle, never
        # widens, and a no-op when already at or below the cap, so no
        # partition-count probe (df.rdd conversion) is needed
        out = df.coalesce(num_partitions) if num_partitions is not None else df
        writer = (
            out.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", dbtable)
            .option("driver", self.driver)
            .option("batchsize", str(self.batch_size))
            .option("isolationLevel", self.isolation_level)
            .option("truncate", "true" if truncate else "false")
        )
        if self.user:
            writer = writer.option("user", self.user)
        if self.password:
            writer = writer.option("password", self.password)
        for k, v in self.extra.items():
            writer = writer.option(k, v)
        writer.mode(mode).save()

    def read_back(self, spark: SparkSession, dbtable: str) -> DataFrame:
        """Verification scan of a written table (round-trip tests)."""
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", dbtable)
            .option("driver", self.driver)
        )
        if self.user:
            reader = reader.option("user", self.user)
        if self.password:
            reader = reader.option("password", self.password)
        return reader.load()

    def write_column_groups(
        self,
        df: DataFrame,
        base_table: str,
        entity_col: str,
        max_columns: int = 40,
        mode: str = "overwrite",
        num_partitions: int | None = 8,
    ) -> list[str]:
        """Write a wide flat table as MySQL-width-capped sibling tables.

        The reference splits flats past ``mambaetl.analysis.columns``
        (reference: README.md:130-131,154 — MySQL rows break past ~160
        columns) into ``<table>_1..k`` sharing the entity key. Parquet
        needs no cap, so the split lives HERE, on the JDBC export path
        only. Returns the written table names; the re-join on the entity
        key is lossless (pinned by the flatten_column_groups oracle).
        """
        value_cols = [c for c in df.columns if c != entity_col]
        if len(value_cols) <= max_columns:
            self.write(df, base_table, mode=mode, num_partitions=num_partitions)
            return [base_table]
        names: list[str] = []
        for gi in range(0, len(value_cols), max_columns):
            cols = value_cols[gi : gi + max_columns]
            name = f"{base_table}_{gi // max_columns + 1}"
            self.write(
                df.select(entity_col, *cols),
                name,
                mode=mode,
                num_partitions=num_partitions,
            )
            names.append(name)
        return names
