"""End-to-end crawl-ingest bundle (VERDICT r12 #5): the reference's
job lifecycle (O1-O3, O8, O9, K1, K3, K4, K8) driving the [EXT]
curation chain — download -> html_extract -> C4 gate ->
near-dup gate vs the persisted band index -> index generation bump ->
lifecycle-stamped dataset load — as ONE bundle-discovered job run."""

from __future__ import annotations

import os

import pytest

from datacamp_etl_spark.jobs.bundle import JobBundleManager

BUNDLE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "jobs",
)

# A paragraph long enough to clear the C4 battery (>=3 sentences,
# >=5 words, no placeholder/boilerplate markers).
GOOD_PARA = (
    "The river rises in the eastern hills and winds through three "
    "valleys before reaching the sea. Local records describe the "
    "crossing as the busiest trade route of the region. Merchants "
    "carried salt and cloth over the old stone bridge for centuries."
)


def _page(body: str) -> str:
    return (
        "<html><head><title>t</title><script>var x=1;</script></head>"
        f"<body><p>{body}</p>"
        '<div><a href="https://nav.example.com/">home</a></div>'
        "</body></html>"
    )


@pytest.fixture()
def pages(tmp_path):
    """Four crawl pages: two good distinct docs, one near-dup of the
    first (differs by one trailing word), one quality-reject (lorem
    ipsum placeholder)."""
    d = tmp_path / "www"
    d.mkdir()
    texts = {
        "p1": GOOD_PARA,
        "p2": (
            "Granite quarries opened north of the town in the last "
            "century. The stone was floated downriver on flat barges. "
            "Most of the public buildings still standing were faced "
            "with it. Demand collapsed when concrete became cheap."
        ),
        "p3": GOOD_PARA + " Honestly.",  # near-dup of p1
        "p4": "Lorem ipsum dolor sit amet. Filler text. Placeholder.",
    }
    specs = []
    for name, body in texts.items():
        f = d / f"{name}.html"
        f.write_text(_page(body))
        specs.append({"url": f.as_uri(), "filename": f"{name}.html"})
    return specs


def test_crawl_ingest_bundle_end_to_end(manager, pages):
    # -- O1/O2: discover + load the bundle from the search path -------
    bm = JobBundleManager([BUNDLE_DIR])
    manager.bundle_manager = bm
    assert "crawl_ingest" in bm.available_jobs()
    cls = bm.job_class("crawl_ingest")
    assert cls.__name__ == "CrawlIngestLoading"

    # -- seed the persisted band index with p1's text so the near-dup
    # gate has a corpus to collide with (p1 and its near-dup p3 both
    # share all band keys with the seed; p2 shares none) --------------
    from datacamp_etl_spark.operators.dedup import band_signatures

    seed = manager.spark.createDataFrame(
        [("seed1", GOOD_PARA)], "doc_id string, text string"
    )
    base_index = band_signatures(seed, num_hashes=16, bands=4, k=3)
    manager.dataset.save(base_index, "crawl_band_index")

    # -- run ------------------------------------------------------------
    job = cls(manager)
    job.url_specs = pages
    manager.run_job(job)
    assert job.status == "ok", job.message

    # gated-document counts: 4 urls -> 4 pages -> 3 past quality
    # (p4 = lorem ipsum) -> 1 survivor (p1, p3 collide with the seed)
    assert job.gate_counts == {
        "robots_blocked": 0,  # no crawl_robots table seeded
        "urls": 4,
        "downloaded": 4,
        "pages": 4,
        "quality_kept": 3,
        "dedup_survivors": 1,
        "index_generation": 1,  # base index carried no generation col
    }

    # -- index generation bump: base rows stamped 0, appended rows 1 --
    idx = manager.dataset.table("crawl_band_index")
    gens = {
        (r["doc_id"], r["generation"]) for r in idx.collect()
    }
    assert {g for _d, g in gens} == {0, 1}
    assert ("seed1", 0) in gens and ("p2", 1) in gens
    assert all(d != "p1" and d != "p3" for d, _g in gens if _g == 1)

    # -- survivors landed with full lifecycle stamps (K1/K4) ----------
    out = manager.dataset.table("crawl_documents")
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == ["p2"]
    assert rows[0]["record_status"] == "new"
    assert rows[0]["batch_id"] == job.batch_id
    assert rows[0]["created_by"] == "system_loading"

    # -- K3: staging watermark stamped on the loaded staging table ----
    staged = manager.staging.table("crawl_survivors_staging")
    assert staged.where("etl_loaded_date IS NOT NULL").count() == 1

    # -- K8: batch provenance row --------------------------------------
    batches = manager.store.read("etl_batches")
    assert len(batches) == 1
    assert batches.iloc[0]["batch_source"] == "crawl_ingest"

    # -- O3: status transitions with the chain's phases ---------------
    statuses = manager.store.read("etl_job_status")
    assert list(statuses["status"]) == ["ok"]
    assert statuses.iloc[0]["phase"] == "finalize"


def test_crawl_ingest_cold_start_builds_index(manager, pages):
    """No pre-existing band index: everything past quality survives
    and the index is created at generation 1."""
    bm = JobBundleManager([BUNDLE_DIR])
    cls = bm.job_class("crawl_ingest")
    job = cls(manager)
    job.url_specs = pages[:2]  # p1, p2 — distinct good docs
    manager.run_job(job)
    assert job.status == "ok", job.message
    assert job.gate_counts["dedup_survivors"] == 2
    assert job.gate_counts["index_generation"] == 1
    idx = manager.dataset.table("crawl_band_index")
    assert {r["generation"] for r in idx.collect()} == {1}
    assert manager.dataset.table("crawl_documents").count() == 2


def test_crawl_ingest_robots_gate_blocks_before_fetch(manager, pages):
    """Seeding a (host, robots_txt) table makes phase 0 gate the
    frontier through parse_robots/crawl_allowed: the disallowed URL
    is never fetched (urls count excludes it), and the rest of the
    lifecycle runs untouched. file:// URIs carry an empty authority,
    so the rule row's host is ''."""
    from urllib.parse import urlparse

    bm = JobBundleManager([BUNDLE_DIR])
    cls = bm.job_class("crawl_ingest")
    job = cls(manager)

    p4_path = urlparse(pages[3]["url"]).path
    robots_txt = f"User-agent: *\nDisallow: {p4_path}\n"
    rdf = manager.spark.createDataFrame(
        [("", robots_txt)], "host string, robots_txt string"
    )
    manager.dataset.save(rdf, "crawl_robots")

    job.url_specs = pages
    manager.run_job(job)
    assert job.status == "ok", job.message
    assert job.gate_counts["robots_blocked"] == 1
    assert job.gate_counts["urls"] == 3          # p4 never fetched
    assert job.gate_counts["quality_kept"] == 3  # the reject was p4
    assert job.gate_counts["dedup_survivors"] == 3  # cold start
