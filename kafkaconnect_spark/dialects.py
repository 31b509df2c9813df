"""SQL dialect layer for the JDBC sink — upsert/delete/DDL per engine.

The reference exercises MySQL targets
(connector_configs/mysql_jdbc_sink_customers.json) and PostgreSQL
targets (heterogeneous sync lab, 실습수행/Debezium Source MySQL에서
JDBC Sink PostgreSQL 연동 실습.md:267-427). Kafka Connect's JDBC sink
generates `INSERT ... ON DUPLICATE KEY UPDATE` for MySQL and
`INSERT ... ON CONFLICT ... DO UPDATE` for PostgreSQL; we generate the
same statements. SQLite (stdlib) is the in-container test dialect —
its upsert syntax matches PostgreSQL's.

Statements are parameterized (DB-API qmark/format style) and executed
per-executor-partition by the writer, exactly like Connect sink tasks
each holding their own JDBC connection.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass(frozen=True)
class Dialect:
    name: str
    placeholder: str  # DB-API paramstyle token
    quote: str

    def q(self, ident: str) -> str:
        # allow schema-qualified targets like "ops_sink.customers_sink"
        # (table.name.format, …JDBC Sink PostgreSQL 연동 실습.md:279)
        return ".".join(f"{self.quote}{p}{self.quote}" for p in ident.split("."))

    # ---- DML ----------------------------------------------------------
    def upsert_sql(self, table: str, columns: list[str], pk: list[str]) -> str:
        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join([self.placeholder] * len(columns))
        non_pk = [c for c in columns if c not in pk]
        if self.name == "mysql":
            if non_pk:
                sets = ", ".join(f"{self.q(c)} = VALUES({self.q(c)})" for c in non_pk)
                return f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph}) ON DUPLICATE KEY UPDATE {sets}"
            return f"INSERT IGNORE INTO {self.q(table)} ({cols}) VALUES ({ph})"
        # postgres & sqlite share ON CONFLICT
        conflict = ", ".join(self.q(c) for c in pk)
        if non_pk:
            sets = ", ".join(f"{self.q(c)} = excluded.{self.q(c)}" for c in non_pk)
            action = f"DO UPDATE SET {sets}"
        else:
            action = "DO NOTHING"
        return (
            f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph}) "
            f"ON CONFLICT ({conflict}) {action}"
        )

    def insert_sql(self, table: str, columns: list[str]) -> str:
        cols = ", ".join(self.q(c) for c in columns)
        ph = ", ".join([self.placeholder] * len(columns))
        return f"INSERT INTO {self.q(table)} ({cols}) VALUES ({ph})"

    def delete_sql(self, table: str, pk: list[str]) -> str:
        cond = " AND ".join(f"{self.q(c)} = {self.placeholder}" for c in pk)
        return f"DELETE FROM {self.q(table)} WHERE {cond}"

    # ---- DDL (auto.create / auto.evolve, SURVEY §2.2 K4/K5) ------------
    def ddl_type(self, dt: T.DataType) -> str:
        if isinstance(dt, T.DecimalType):
            return f"DECIMAL({dt.precision},{dt.scale})"
        mapping = {
            T.BooleanType: {"mysql": "TINYINT(1)", "postgres": "BOOLEAN", "sqlite": "INTEGER"},
            T.IntegerType: {"mysql": "INT", "postgres": "INTEGER", "sqlite": "INTEGER"},
            T.LongType: {"mysql": "BIGINT", "postgres": "BIGINT", "sqlite": "INTEGER"},
            T.ShortType: {"mysql": "SMALLINT", "postgres": "SMALLINT", "sqlite": "INTEGER"},
            T.FloatType: {"mysql": "FLOAT", "postgres": "REAL", "sqlite": "REAL"},
            T.DoubleType: {"mysql": "DOUBLE", "postgres": "DOUBLE PRECISION", "sqlite": "REAL"},
            T.StringType: {"mysql": "TEXT", "postgres": "TEXT", "sqlite": "TEXT"},
            T.BinaryType: {"mysql": "BLOB", "postgres": "BYTEA", "sqlite": "BLOB"},
            T.DateType: {"mysql": "DATE", "postgres": "DATE", "sqlite": "TEXT"},
            T.TimestampType: {"mysql": "DATETIME(6)", "postgres": "TIMESTAMP", "sqlite": "TEXT"},
        }
        for spark_t, by_dialect in mapping.items():
            if isinstance(dt, spark_t):
                return by_dialect[self.name]
        raise TypeError(f"no {self.name} DDL type for {dt}")

    def create_table_sql(self, table: str, schema: T.StructType, pk: list[str]) -> str:
        cols = [
            f"{self.q(f.name)} {self.ddl_type(f.dataType)}"
            + ("" if f.nullable or f.name in pk else " NOT NULL")
            for f in schema.fields
        ]
        if pk:
            cols.append("PRIMARY KEY (" + ", ".join(self.q(c) for c in pk) + ")")
        return f"CREATE TABLE IF NOT EXISTS {self.q(table)} ({', '.join(cols)})"

    def add_column_sql(self, table: str, field: T.StructField) -> str:
        # auto.evolve only ever ADDs nullable columns — type changes,
        # drops and renames are NOT auto-applied, matching the
        # reference (실습수행/…실습 - 03.md:253-341, SURVEY §2.2 K5).
        return f"ALTER TABLE {self.q(table)} ADD COLUMN {self.q(field.name)} {self.ddl_type(field.dataType)}"


DIALECTS: dict[str, Dialect] = {
    "sqlite": Dialect("sqlite", "?", '"'),
    "postgres": Dialect("postgres", "%s", '"'),
    "mysql": Dialect("mysql", "%s", "`"),
}


def dialect_for_url(url: str) -> Dialect:
    """Pick dialect from a JDBC-style connection.url
    (e.g. jdbc:mysql://localhost:3306/om_sink)."""
    low = url.lower()
    if "mysql" in low or "mariadb" in low:
        return DIALECTS["mysql"]
    if "postgresql" in low or "postgres" in low:
        return DIALECTS["postgres"]
    if "sqlite" in low:
        return DIALECTS["sqlite"]
    raise ValueError(f"cannot infer SQL dialect from url {url!r}")
