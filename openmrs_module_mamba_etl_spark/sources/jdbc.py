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
