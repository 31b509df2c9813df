"""SpoolDir CSV source — streaming file ingest (SURVEY §2.1 S6).

Reference semantics (connector_configs/spooldir_source.json:5-14;
실습수행/Spool Dir Source Connector 실습.md:29-110):

- watch ``input.path`` for files matching ``input.file.pattern``
- parse CSV, first row as header (csv.first.row.as.header)
- *generate* the schema from the data (schema.generation.enabled) —
  done ONCE at registration with a batch inferSchema pass, because a
  Structured Streaming run has a fixed schema (SURVEY §1.3)
- processed files move to ``finished.path`` (Spark: cleanSource=archive
  + sourceArchiveDir), corrupt rows route to ``error.path``
- registration fails fast if the dirs are missing (:76-97) — enforced
  in PipelineSpec.validate.

Scale: Spark's file streaming source lists + checkpoints file names;
``maxFilesPerTrigger`` bounds batch size; parsing is distributed and
codegen'd (no Python in the path). PERMISSIVE mode captures corrupt
rows in ``_corrupt_record`` so one bad line doesn't poison a 100 GB
drop (halt.on.error=false parity).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def generate_schema(
    spark: SparkSession,
    input_path: str,
    pattern: str = "*.csv",
    format: str = "csv",
) -> T.StructType:
    """schema.generation.enabled analogue: infer once, at registration,
    from the files currently present. ``format`` mirrors the SpoolDir
    plugin family (SpoolDirCsvSourceConnector exercised by the labs;
    SpoolDirJsonSourceConnector is the same contract over JSON lines)."""
    if not list(Path(input_path).glob(pattern)):
        # a clear error beats the raw PATH_NOT_FOUND AnalysisException:
        # schema generation needs at least one file present (the
        # engine caches the schema in the spec after first success, so
        # archived files don't re-trigger inference on resume)
        raise ValueError(
            f"schema.generation: no files matching {pattern!r} in "
            f"{input_path!r} — drop at least one file before registering"
        )
    path = str(Path(input_path) / pattern)
    if format == "json":
        # corrupt lines present at inference time surface as a
        # _corrupt_record field — strip it; the stream reader re-adds
        # its own corrupt-capture column
        inferred = spark.read.json(path).schema
        return T.StructType([f for f in inferred.fields if f.name != CORRUPT_COL])
    sample = spark.read.csv(path, header=True, inferSchema=True)
    return sample.schema


def read_spooldir_stream(
    spark: SparkSession,
    input_path: str,
    schema: T.StructType,
    finished_path: str | None = None,
    pattern: str = "*.csv",
    halt_on_error: bool = False,
    max_files_per_trigger: int | None = None,
    format: str = "csv",
) -> DataFrame:
    """Streaming CSV/JSON-lines scan with archive-on-success and
    corrupt-record capture. Returns rows + a ``_corrupt_record`` column
    (null for good rows); route non-null to the error sink downstream."""
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    reader = (
        spark.readStream.format(format)
        .schema(read_schema)
        .option("mode", "FAILFAST" if halt_on_error else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if format == "csv":
        reader = reader.option("header", "true")
    if finished_path:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", finished_path
        )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # Load via an explicit glob (dir/*.csv) rather than dir +
    # pathGlobFilter: the reference nests finished.path inside
    # input.path (실습수행/Spool Dir Source Connector 실습.md:29-45), and
    # Spark only allows a nested sourceArchiveDir when it cannot match
    # the source glob.
    return reader.load(str(Path(input_path) / pattern))


def split_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows without the corrupt col, corrupt raw lines)."""
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
