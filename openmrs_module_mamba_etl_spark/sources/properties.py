"""The reference's runtime-properties configuration surface.

MambaETL is configured through ``mambaetl.analysis.*`` keys in the OpenMRS
runtime properties file (reference: README.md:117-140): db credentials,
source/target database, preferred concepts locale, flat-table column cap,
incremental mode, automated flattening, and the ETL interval. The same keys
configure this engine; physical-workaround keys (the 40-column cap) are
accepted for compatibility and deliberately ignored (columnar Parquet has no
row-width limit — SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

PREFIX = "mambaetl.analysis."


@dataclass(frozen=True)
class MambaProperties:
    """Parsed engine configuration (reference key → field)."""

    db_user: str | None = None  # mambaetl.analysis.db_user (README.md:119)
    db_password: str | None = None  # .db_password (README.md:121)
    source_db: str = "openmrs"  # .db_openmrs (README.md:123)
    target_db: str = "analysis_db"  # .db_etl (README.md:125)
    locale: str = "en"  # .locale (README.md:127-128)
    columns: int = 40  # .columns (README.md:130-131) — accepted, unused
    incremental_mode: bool = True  # .incremental_mode (README.md:133-134)
    automated_flattening: bool = False  # .automated_flattening (README.md:136-137)
    etl_interval_seconds: int = 1800  # .etl_interval (README.md:139-140)

    @staticmethod
    def parse(text: str) -> "MambaProperties":
        """Parse java-properties-style ``key=value`` lines."""
        raw: dict[str, str] = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            if "=" in line:
                k, _, v = line.partition("=")
                raw[k.strip()] = v.strip()

        def get(key: str, default):
            return raw.get(PREFIX + key, default)

        return MambaProperties(
            db_user=get("db_user", None),
            db_password=get("db_password", None),
            source_db=get("db_openmrs", "openmrs"),
            target_db=get("db_etl", "analysis_db"),
            locale=get("locale", "en"),
            columns=int(get("columns", 40)),
            incremental_mode=str(get("incremental_mode", "1")) in ("1", "true"),
            automated_flattening=str(get("automated_flattening", "0"))
            in ("1", "true"),
            etl_interval_seconds=int(get("etl_interval", 1800)),
        )

    @staticmethod
    def load(path: str | Path) -> "MambaProperties":
        return MambaProperties.parse(Path(path).read_text())
