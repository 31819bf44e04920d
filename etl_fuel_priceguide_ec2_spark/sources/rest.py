"""S2/S3 — REST sources, re-expressed for partitioned execution.

Reference semantics:
  * S2 list scan: one GET returning a JSON array of stations
    (``index.js:81-100``).
  * S3 per-key detail fan-out: one GET per station id, awaited
    SEQUENTIALLY in a for-loop (``index.js:112-116``) — the reference's
    actual bottleneck (runtime ≈ N × RTT, SURVEY.md §6).

Spark-first design:
  * The list endpoint is a driver-side fetch (it is one request) whose
    rows become a DataFrame with an explicit schema.
  * The per-key fan-out becomes ``mapInPandas`` over the id partitions:
    each executor issues its partition's requests (batched, connection
    reuse), so wall-clock is N/(partitions) × RTT instead of N × RTT —
    semantically the J1 equi-join between the list and the detail
    source.

No network access exists in this environment, so the transport is an
injectable ``fetcher`` callable; production would pass an
``urllib``/``http.client`` based one. Tests inject deterministic fakes —
the partitioning, batching, schema, and error semantics (P6: bad row
logged + skipped, ``index.js:137-140``) are the real, tested surface.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

Fetcher = Callable[[str], str]
"""Takes a URL, returns the response body (JSON text). Raises on error."""


def read_list_endpoint(
    spark: SparkSession,
    url: str,
    fetcher: Fetcher,
    schema: StructType | str,
    result_path: str = "resultado",
) -> DataFrame:
    """S2: fetch the list endpoint once (driver-side — it is a single
    request) and parallelize the rows with an explicit schema."""
    body = json.loads(fetcher(url))
    rows = body[result_path] if result_path else body
    return spark.createDataFrame(rows, schema=schema)


def enrich_from_detail_endpoint(
    ids: DataFrame,
    id_col: str,
    url_prefix: str,
    fetcher: Fetcher,
    out_schema: StructType | str,
    num_partitions: int | None = None,
) -> DataFrame:
    """S3: per-id detail fetch as partition-parallel mapInPandas.

    Each Arrow batch of ids issues its requests inside the executor;
    a failed/undecodable row is skipped (P6 error-tolerant row
    processing), never failing the job.
    """
    n = num_partitions or ids.sparkSession.sparkContext.defaultParallelism

    schema = (
        StructType.fromDDL(out_schema)
        if isinstance(out_schema, str)
        else out_schema
    )
    field_names = [f.name for f in schema.fields]

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for key in pdf[id_col]:
                try:
                    body = json.loads(fetcher(f"{url_prefix}{key}"))
                    out.append(body)
                except Exception:
                    # P6: log-and-skip semantics (index.js:137-140)
                    continue
            if out:
                # Shape the frame to the declared schema (code-review
                # r16): mapInPandas matches output columns BY NAME, so
                # an optional JSON field absent from every response in
                # a batch (endpoints commonly omit null fields) would
                # raise at the Arrow boundary and fail the job — the
                # opposite of P6. Missing/extra fields become None/are
                # dropped; object dtype keeps absent longs as None
                # (NaN-as-float would break the integer cast).
                frame = pd.DataFrame(out).reindex(columns=field_names)
                yield frame.astype(object).where(frame.notna(), None)

    return ids.select(id_col).repartition(n).mapInPandas(_fetch, schema)
