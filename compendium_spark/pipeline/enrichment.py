"""Run (SRR) metadata enrichment (SURVEY §2.1 S2/S3, §2.8 U3, §3.2).

Reference flow (`/root/reference/db.py:266-470`): pick samples with no
runs, batch their SRS accessions into eUtils ESearch URLs (80/request,
≤1950 chars), fetch EFetch XML via the returned WebEnv token, parse
EXPERIMENT_PACKAGE entries into partial-update dicts, and apply them
as dynamic `UPDATE samples SET ... WHERE srs=?` — only fetched fields
overwrite.

Spark-first decomposition:
  * candidates      — DataFrame query (P3 + O1 seeded sample);
  * batching        — floor(row_number/80) batch ids, URL per batch
                      with the reference's length guard;
  * transport       — injectable `fetch(url) -> str` adapter (HTTP is
                      a side effect, not an engine concern; tests
                      inject a mock). Two-strike error policy
                      (`db.py:292-384`) lives here;
  * response parse  — EXPERIMENT_PACKAGE → staged updates DataFrame
                      (pure function, unit-testable);
  * apply           — operators.merge.partial_update reproduces the
                      only-non-null-fields-overwrite semantics
                      (`db.py:445-462`), idempotently.

The staging-then-merge split is what makes the fetch stage safe under
task retries/speculation at scale (SURVEY §4 note 1).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from compendium_spark.operators.merge import partial_update

ESEARCH_PREFIX = (
    "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/esearch.fcgi"
    "?db=sra&usehistory=y&term="
)
EFETCH_PREFIX = (
    "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi"
    "?db=sra&query_key=1"
)
MAX_URL_LEN = 1950  # db.py:314-317 and db.py:356-359 (both requests)
PER_QUERY = 80  # db.py:266
PACING_SECONDS = 0.5  # db.py:320 — NCBI rate courtesy, before each pair
HTTP_TIMEOUT = 25.0  # config_template timeout the reference passes
UPDATE_FIELDS = (
    "srr",
    "project",
    "library_strategy",
    "library_source",
    "pubdate",
    "total_bases",
    "instrument",
)


def enrichment_candidates(samples: DataFrame, count: int, seed: int = 42) -> DataFrame:
    """Samples needing run lookup (P3+O1, `db.py:278-282`):
    WHERE srr IS NULL ORDER BY RANDOM() LIMIT count."""
    return (
        samples.filter(F.col("srr").isNull())
        .select("srs")
        .orderBy(F.rand(seed))
        .limit(count)
    )


def with_batch_ids(candidates: DataFrame, per_query: int = PER_QUERY) -> DataFrame:
    """Assign batch ids: floor(row_number / per_query) — the Spark form
    of the reference's cursor loop (`db.py:305-313`)."""
    w = Window.orderBy("srs")
    return candidates.withColumn(
        "batch", F.floor((F.row_number().over(w) - 1) / per_query)
    )


def build_esearch_url(accessions: Iterable[str], prefix: str = ESEARCH_PREFIX) -> str:
    """ESearch URL of `SRS...[accn] or` terms (`db.py:305-317`),
    with the trailing ' or ' trimmed and the length guard."""
    url = prefix + "".join(f"{a}[accn] or " for a in accessions)
    url = url[:-4]
    if len(url) > MAX_URL_LEN:
        raise UrlTooLongError(f"URL IS TOO LONG ({len(url)} > {MAX_URL_LEN} chars)")
    return url


def parse_efetch_response(xml_text: str) -> list[dict]:
    """EFetch XML → staged update dicts (S3, `db.py:388-438`).

    Per EXPERIMENT_PACKAGE: sample accession, run accessions
    (0 runs → entry skipped `db.py:433-438`; >1 → kept as a list,
    stored as array per SURVEY §1.3 instead of ';'-joined), plus
    optional pubdate / total_bases / project / strategy / source /
    instrument.
    """
    root = ET.fromstring(xml_text)
    out: list[dict] = []
    for package in root.findall("EXPERIMENT_PACKAGE"):
        sample = None
        for entry in package.iter("SAMPLE"):
            if "accession" in entry.attrib:
                sample = entry.attrib["accession"]
        runs: list[str] = []
        pubdate = total_bases = None
        for entry in package.iter("RUN"):
            if "accession" in entry.attrib:
                runs.append(entry.attrib["accession"])
            if "published" in entry.attrib:
                pubdate = entry.attrib["published"]
            if "total_bases" in entry.attrib:
                total_bases = entry.attrib["total_bases"]
        project = None
        for entry in package.iter("EXTERNAL_ID"):
            if entry.attrib.get("namespace") == "BioProject":
                project = entry.text
                break
        strategy = source = instrument = None
        for entry in package.iter("LIBRARY_STRATEGY"):
            strategy = entry.text
        for entry in package.iter("LIBRARY_SOURCE"):
            source = entry.text
        for entry in package.iter("INSTRUMENT_MODEL"):
            instrument = entry.text
        if not runs:  # db.py:433-438
            continue
        out.append(
            {
                "srs": sample,
                "srr": runs,
                "project": project,
                "library_strategy": strategy,
                "library_source": source,
                "pubdate": pubdate,
                "total_bases": int(total_bases) if total_bases is not None else None,
                "instrument": instrument,
            }
        )
    return out


class TwoStrikeError(RuntimeError):
    """Second consecutive transport failure (`db.py:292`, `db.py:326-384`)."""


class UrlTooLongError(ValueError):
    """A built eUtils URL exceeds {MAX_URL_LEN} chars. The reference
    hard-bails immediately on BOTH guards (`db.py:314-317` and
    `db.py:356-359` are `exit(1)`, not a strike), so this error is
    NON-strikeable: ``fetch_batches`` re-raises it instead of
    counting it toward the two-strike policy (ADVICE r13). Subclasses
    ValueError for callers matching the original type."""


class WebEnvMissingError(RuntimeError):
    """ESearch answered without a WebEnv token (`db.py:344-352`) —
    strike-able like a transport error, never a crash."""


def make_eutils_fetch(
    get: Callable[[str], str] | None = None,
    sleep: Callable[[float], None] | None = None,
    esearch_prefix: str = ESEARCH_PREFIX,
    efetch_prefix: str = EFETCH_PREFIX,
) -> Callable[[str], str]:
    """The REAL two-request eUtils transport (`db.py:318-373`), as a
    `fetch(esearch_url) -> efetch_xml_text` suitable for
    ``fetch_batches``:

      1. pace {PACING_SECONDS} s (courtesy delay BEFORE the pair);
      2. GET the ESearch URL (usehistory=y) and parse its XML;
      3. thread the returned <WebEnv> token into the EFetch URL
         (`query_key=1&WebEnv=...`, `db.py:355`), re-checking the
         {MAX_URL_LEN}-char guard on the SECOND URL too
         (`db.py:356-359`);
      4. GET the EFetch URL and return its body for
         ``parse_efetch_response``.

    ``get(url) -> text`` is the wire seam: it defaults to
    ``requests.get(..., timeout=HTTP_TIMEOUT).text`` with
    raise_for_status (import-guarded — this container has no
    network), and tests replay RECORDED response bytes through this
    exact code path, so URL building, WebEnv threading and the error
    taxonomy are exercised without a socket (VERDICT r12 #5). Every
    failure mode the reference strikes on — transport error, ESearch
    parse error, missing WebEnv — raises here and becomes one strike
    in ``fetch_batches``.
    """
    if get is None:  # pragma: no cover — needs network
        import requests  # noqa: PLC0415

        def get(url: str) -> str:
            resp = requests.get(url, timeout=HTTP_TIMEOUT)
            resp.raise_for_status()
            return resp.text

    if sleep is None:
        import time as _time  # noqa: PLC0415

        sleep = _time.sleep

    def fetch(esearch_url: str) -> str:
        sleep(PACING_SECONDS)
        es_text = get(esearch_url)
        tree = ET.fromstring(es_text)  # ParseError -> one strike
        webenv = tree.find("WebEnv")  # direct child, as the ref reads it
        if webenv is None or not webenv.text:
            raise WebEnvMissingError(
                "Got response without a 'webenv' field."
            )
        url = f"{efetch_prefix}&WebEnv={webenv.text}"
        if len(url) > MAX_URL_LEN:
            # db.py:356-359 is exit(1): immediate bail, NOT a strike —
            # the typed error is re-raised by fetch_batches (ADVICE r13)
            raise UrlTooLongError(
                f"URL IS TOO LONG ({len(url)} > {MAX_URL_LEN} chars)"
            )
        return get(url)

    return fetch


def fetch_batches(
    batches: list[list[str]],
    fetch: Callable[[str], str],
) -> list[dict]:
    """Run the batched fetch loop with the two-strike error policy.

    `fetch` is the injected transport (``make_eutils_fetch`` in
    production — the reference's 0.5 s pause and 25 s timeout live
    there — a mock in tests). One failure skips the batch; two
    consecutive failures abort (`db.py:292`). Properly catches
    transport errors — the reference's un-imported ReadTimeoutError
    (Quirk Q2) is fixed by design. A misformed EFetch BODY is a
    strike too (`db.py:374-381`), so the parse sits inside the same
    try; ``error_previous`` resets only after a full fetch+parse
    success, exactly like the reference's loop. One exception is NOT
    strikeable: :class:`UrlTooLongError` re-raises immediately, both
    from the ESearch build (pre-try) and from inside the transport's
    EFetch guard — the reference exits(1) on both (`db.py:314-317`,
    `db.py:356-359`), ADVICE r13."""
    staged: list[dict] = []
    error_previous = False
    for batch in batches:
        url = build_esearch_url(batch)
        try:
            parsed = parse_efetch_response(fetch(url))
        except UrlTooLongError:
            raise  # reference hard-bails here — never a strike
        except Exception:
            if error_previous:
                raise TwoStrikeError("Two errors in a row. Bailing.") from None
            error_previous = True
            continue
        error_previous = False
        staged.extend(parsed)
    return staged


def apply_enrichment(samples: DataFrame, staged: DataFrame) -> DataFrame:
    """MERGE staged updates into `samples`: only non-null fetched
    fields overwrite (J6/K2, `db.py:440-470`); unknown srs are
    silently dropped like the reference's no-op UPDATE."""
    return partial_update(samples, staged.select("srs", *UPDATE_FIELDS), key="srs")


# ---------------------------------------------------------------------------
# distributed fetch twin (VERDICT r13 #6, SURVEY §3.2 staged form)
# ---------------------------------------------------------------------------

# staged rows carry their batch id + a per-batch error column so the
# driver can apply the bail policy AFTER the distributed fetch
STAGED_FETCH_SCHEMA = (
    "batch bigint, srs string, srr array<string>, project string, "
    "library_strategy string, library_source string, pubdate string, "
    "total_bases bigint, instrument string, error string"
)
_STAGED_COLS = [
    "batch", "srs", "srr", "project", "library_strategy",
    "library_source", "pubdate", "total_bases", "instrument", "error",
]


def fetch_batches_distributed(
    batched: DataFrame,
    fetch_factory: Callable[[], Callable[[str], str]],
    n_parallel: int = 4,
) -> DataFrame:
    """The 100×-scale twin of ``fetch_batches``: batch-id partitions →
    ``mapInPandas`` transport → staging DataFrame (feed it to
    ``apply_enrichment`` / ``Warehouse.partial_update``, which is
    idempotent — a speculated or retried task re-fetching a batch
    lands the same MERGE).

    ``batched`` is ``with_batch_ids``'s output (srs, batch).
    ``fetch_factory() -> fetch(url) -> xml_text`` builds the transport
    INSIDE each task (``make_eutils_fetch`` in production, a replay
    transport in tests) — sockets and sessions never serialize, and
    the 0.5 s courtesy pause runs per task slot, so the GLOBAL request
    rate is bounded by ``n_parallel`` / {PACING_SECONDS} s: that knob
    is the repartition width, the unit of politeness the reference
    enforces serially (`db.py:320`).

    Error semantics vs the serial loop (documented divergence, same
    accept/reject contract):
      * ``UrlTooLongError`` raises through the task and FAILS THE JOB
        — the reference's immediate `exit(1)` (`db.py:314-317,
        356-359`), never a strike;
      * any other per-batch failure becomes an ERROR ROW (batch id +
        exception text, data columns null) instead of mutating shared
        strike state — executors can't share ``error_previous``. The
        driver applies the SAME two-consecutive-failures rule post
        hoc with :func:`check_two_strikes` over the returned frame;
        the serial loop stops fetching after the second strike while
        the twin has already fetched everything, so the divergence is
        wasted work on a doomed run, never a result difference.
    """
    agg = (
        batched.groupBy("batch")
        .agg(F.sort_array(F.collect_list("srs")).alias("accs"))
        .repartition(n_parallel, "batch")
    )

    def run(iterator):
        import pandas as pd  # noqa: PLC0415

        fetch = fetch_factory()  # one transport per task
        for pdf in iterator:
            out: list[dict] = []
            for batch_id, accs in zip(pdf["batch"], pdf["accs"]):
                blank = dict.fromkeys(_STAGED_COLS)
                try:
                    parsed = parse_efetch_response(
                        fetch(build_esearch_url(list(accs)))
                    )
                except UrlTooLongError:
                    raise  # reference hard-bails — fail the job
                except Exception as exc:  # noqa: BLE001 — strike row
                    out.append(
                        {
                            **blank,
                            "batch": batch_id,
                            "error": f"{type(exc).__name__}: {exc}"[:500],
                        }
                    )
                    continue
                out.extend(
                    {**blank, **d, "batch": batch_id} for d in parsed
                )
            yield pd.DataFrame(out, columns=_STAGED_COLS)

    return agg.mapInPandas(run, STAGED_FETCH_SCHEMA)


def check_two_strikes(staged: DataFrame) -> DataFrame:
    """Apply the reference's bail rule to a distributed fetch result:
    two CONSECUTIVE batches (by batch id) that both errored abort the
    run (`db.py:292` — ``error_previous`` resets on any success), else
    return the good rows (error-free, error column dropped) ready for
    ``apply_enrichment``. One driver-side pass over the per-batch
    error flags — O(batches), the same state the serial loop keeps."""
    flags = (
        staged.groupBy("batch")
        .agg(F.max(F.col("error").isNotNull()).alias("failed"))
        .orderBy("batch")
        .collect()
    )
    prev = False
    for r in flags:
        if r["failed"] and prev:
            raise TwoStrikeError("Two errors in a row. Bailing.")
        prev = bool(r["failed"])
    return staged.filter(F.col("error").isNull()).drop("error")
