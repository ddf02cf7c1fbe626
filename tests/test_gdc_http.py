"""Fixture-replayed tests for the live GDC REST fetcher
(`sources/ingest.gdc_http_fetcher`, round-11 verdict item 5): the
recorded responses in tests/fixtures_gdc/gdc_recorded.json stand in
for the portal, so CI never needs network while the full request
shape (files query -> per-file TSV download -> clinical join -> star
normalize) is exercised end-to-end, including through
``ingest_gdc_star``'s executor-side ``applyInPandas`` path (the
transport pickles into workers)."""

from __future__ import annotations

import json
import os

import pytest

from tcga_query_project_spark.sources import ingest

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures_gdc",
    "gdc_recorded.json",
)
ENDPOINT = "https://api.gdc.cancer.gov"
BARCODES = ["TCGA-BR-0001-01A", "TCGA-LU-0002-11A"]


class ReplayTransport:
    """Recorded-response transport: maps '<METHOD> <path>' to the
    fixture payload and logs every request for shape assertions.
    Plain-dict state, so it pickles into applyInPandas executors."""

    def __init__(self, path: str = FIXTURE):
        with open(path) as fh:
            self.recorded = json.load(fh)
        self.requests: list[tuple[str, bytes | None]] = []

    def __call__(self, url: str, data: bytes | None, headers: dict) -> bytes:
        self.requests.append((url, data))
        method = "GET" if data is None else "POST"
        key = f"{method} {url.removeprefix(ENDPOINT)}"
        if key not in self.recorded:
            raise KeyError(f"no recorded response for {key}")
        payload = self.recorded[key]
        if isinstance(payload, str):
            return payload.encode()
        return json.dumps(payload).encode()


class FlakyTransport(ReplayTransport):
    """Fails the first ``n_failures`` calls, then replays — exercises
    the retry/backoff loop."""

    def __init__(self, n_failures: int):
        super().__init__()
        self.n_failures = n_failures
        self.calls = 0

    def __call__(self, url, data, headers):
        self.calls += 1
        if self.calls <= self.n_failures:
            raise OSError(f"simulated transport failure #{self.calls}")
        return super().__call__(url, data, headers)


def test_http_fetcher_replays_recorded_responses():
    tx = ReplayTransport()
    fetch = ingest.gdc_http_fetcher(ENDPOINT, transport=tx)
    df = fetch(BARCODES)
    assert list(df.columns) == [
        "barcode", "project", "short_letter_code", "vital_status",
        "days_to_death", "paper_days_to_last_followup", "gene_id",
        "gene_name", "count",
    ]
    # 2 files x 3 genes; the four N_* summary rows and the comment
    # line of the STAR TSV are dropped (GDCprepare semantics)
    assert len(df) == 6
    br = df[df.barcode == "TCGA-BR-0001-01A"]
    lu = df[df.barcode == "TCGA-LU-0002-11A"]
    assert len(br) == 3 and len(lu) == 3
    # project from the API's project_id, not the barcode heuristic
    assert set(br.project) == {"TCGA-BRCA"}
    assert set(lu.project) == {"TCGA-LUAD"}
    # sample-type code from barcode chars 14-15: 01 -> TP, 11 -> NT
    assert set(br.short_letter_code) == {"TP"}
    assert set(lu.short_letter_code) == {"NT"}
    # clinical join: demographic + first diagnosis, numeric -> string
    # (FETCHED_SCHEMA keeps the reference's character columns)
    assert set(br.vital_status) == {"Dead"}
    assert set(br.days_to_death) == {"455"}
    assert br.paper_days_to_last_followup.isna().all()
    assert set(lu.vital_status) == {"Alive"}
    assert lu.days_to_death.isna().all()
    assert set(lu.paper_days_to_last_followup) == {"987"}
    # counts come from the 'unstranded' column, keyed by gene
    cnt = {(r.barcode, r.gene_id): r["count"] for _, r in df.iterrows()}
    assert cnt[("TCGA-BR-0001-01A", "ENSG00000000003.15")] == 1234
    assert cnt[("TCGA-LU-0002-11A", "ENSG00000000419.13")] == 9000


def test_http_fetcher_request_shape():
    """The /files POST carries the reference's GDCquery semantics:
    12-char case ids, Gene Expression Quantification data type,
    STAR - Counts workflow (vital_status_DESeq.R:60-65)."""
    tx = ReplayTransport()
    ingest.gdc_http_fetcher(ENDPOINT, transport=tx)(BARCODES)
    files_reqs = [d for u, d in tx.requests if u.endswith("/files")]
    assert len(files_reqs) == 1  # both barcodes fit one 75-file chunk
    body = json.loads(files_reqs[0])
    blob = json.dumps(body["filters"])
    assert "TCGA-BR-0001" in blob and "TCGA-LU-0002" in blob
    assert "Gene Expression Quantification" in blob
    assert "STAR - Counts" in blob
    # per-file data GETs, one per hit
    data_reqs = [u for u, d in tx.requests if "/data/" in u]
    assert sorted(data_reqs) == [
        f"{ENDPOINT}/data/f-br", f"{ENDPOINT}/data/f-lu",
    ]


def test_http_fetcher_batches_at_files_per_request():
    """files.per.chunk semantics inside one fetch call: 5 barcodes at
    files_per_request=2 -> 3 /files POSTs (2+2+1)."""
    tx = ReplayTransport()
    fetch = ingest.gdc_http_fetcher(
        ENDPOINT, files_per_request=2, transport=tx
    )
    fetch([f"TCGA-BR-{i:04d}-01A" for i in range(5)])
    files_reqs = [u for u, d in tx.requests if u.endswith("/files")]
    assert len(files_reqs) == 3


def test_retry_backoff_recovers_then_exhausts():
    # two failures, then replay succeeds (3 retries available)
    flaky = FlakyTransport(n_failures=2)
    fetch = ingest.gdc_http_fetcher(
        ENDPOINT, retries=3, backoff=0.0, transport=flaky
    )
    assert len(fetch(BARCODES)) == 6
    # more failures than retries -> the original error surfaces
    dead = FlakyTransport(n_failures=99)
    fetch = ingest.gdc_http_fetcher(
        ENDPOINT, retries=2, backoff=0.0, transport=dead
    )
    with pytest.raises(OSError, match="simulated transport failure"):
        fetch(BARCODES)


def test_portal_probe_and_default_fetcher_selection():
    # reachable (recorded /status) -> the HTTP fetcher is selected
    tx = ReplayTransport()
    assert ingest.gdc_portal_reachable(ENDPOINT, transport=tx)
    live = ingest.default_fetcher(ENDPOINT, transport=tx)
    assert len(live(BARCODES)) == 6

    # unreachable -> hermetic simulator (closed seam, same schema)
    def down(url, data, headers):
        raise OSError("no route to host")

    assert not ingest.gdc_portal_reachable(ENDPOINT, transport=down)
    sim = ingest.default_fetcher(ENDPOINT, transport=down)
    df = sim(["TCGA-BR-0001-01A"])
    assert len(df) == 50  # simulator's n_genes default
    assert list(df.columns)[0] == "barcode"


def test_parse_star_counts_drops_summary_rows():
    tsv = ("# gene-model: GENCODE v36\n"
           "gene_id\tgene_name\tgene_type\tunstranded\n"
           "N_unmapped\t\t\t10\n"
           "N_ambiguous\t\t\t11\n"
           "ENSG1.1\tA\tpc\t7\n"
           "ENSG2.1\tB\tpc\t0\n")
    assert ingest._parse_star_counts(tsv) == [
        ("ENSG1.1", "A", 7), ("ENSG2.1", "B", 0),
    ]


def test_ingest_star_end_to_end_with_replayed_http(spark, tmp_path):
    """The whole S4 dataflow over the HTTP fetcher: manifest ->
    chunked applyInPandas fetch (transport pickled to executors) ->
    star normalize -> pruned/bucketed layout. ingest_gdc_star itself
    is unchanged (the seam holds, round-11 verdict item 5). The
    transport here is a nested closure over the recorded dict —
    cloudpickle ships it to workers BY VALUE, whereas a class from
    this (non-importable-on-executors) test module cannot cross the
    applyInPandas boundary."""
    with open(FIXTURE) as fh:
        recorded = json.load(fh)

    def replay(url, data, headers, _rec=recorded):
        key = ("GET " if data is None else "POST ") + url.removeprefix(
            ENDPOINT
        )
        payload = _rec[key]
        if isinstance(payload, str):
            return payload.encode()
        return json.dumps(payload).encode()

    fetch = ingest.gdc_http_fetcher(ENDPOINT, transport=replay)
    tables = ingest.ingest_gdc_star(
        spark,
        BARCODES,
        str(tmp_path / "star"),
        fetch_fn=fetch,
        files_per_chunk=75,
        expression_table="ingest_expression_http_test",
        n_buckets=2,
    )
    try:
        assert tables["expression"].count() == 6
        samples = {
            r["barcode"]: r for r in tables["samples"].collect()
        }
        assert samples["TCGA-BR-0001-01A"]["project"] == "TCGA-BRCA"
        assert samples["TCGA-BR-0001-01A"]["vital_status"] == "Dead"
        assert samples["TCGA-LU-0002-11A"]["short_letter_code"] == "NT"
        assert samples["TCGA-LU-0002-11A"]["submitter_id"] == "TCGA-LU-0002"
        assert tables["genes"].count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS ingest_expression_http_test")
