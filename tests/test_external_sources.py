from collections import namedtuple

from parquet_extractor_spark.constants import MAX_DOCS
from parquet_extractor_spark.sources.ir_datasets_source import docs_iter_to_df
from parquet_extractor_spark.sources.wikipedia import (
    category_titles,
    crawl_category,
    fetch_pages,
)

Doc = namedtuple("Doc", ["doc_id", "title", "text"])
BodyDoc = namedtuple("BodyDoc", ["doc_id", "body"])


def test_docs_iter_normalization(spark):
    docs = [Doc("d1", "Title 1", "text one"), Doc("d2", None, "text two")]
    df = docs_iter_to_df(spark, docs)
    rows = {r.doc_id: r for r in df.collect()}
    assert rows["d1"].title == "Title 1"
    assert rows["d1"].text == "text one"
    assert rows["d2"].url is None


def test_docs_iter_body_fallback_and_cap(spark):
    # text falls back to body (api.py:290-293); cap at MAX_DOCS
    docs = (BodyDoc(str(i), f"body {i}") for i in range(MAX_DOCS + 100))
    df = docs_iter_to_df(spark, docs, limit=10_000)
    assert df.count() == MAX_DOCS
    assert df.filter("text IS NULL").count() == 0


# NOTE: fetch fakes must be CLOSURES (defined inside the tests), not
# module-level functions — cloudpickle serializes module-level funcs by
# reference and executors can't import the tests package.
def _make_fakes():
    base = {
        "World_War_II": [("Battle of X", 0), ("Template:War", 10), ("Battle of Y", 0)],
        "WWII_by_country": [("Battle of X", 0), ("Battle of Z", 0)],
    }

    def fake_members(cat):
        return base[cat]

    def fake_fetch(title):
        if title == "Battle of Z":
            return (False, None, None)  # non-existent page (P8)
        return (True, f"Full text of {title}", f"Summary of {title}")

    return fake_members, fake_fetch


def test_category_titles_dedup_and_namespace_filter(spark):
    fake_members, _ = _make_fakes()
    titles = category_titles(
        spark, ["World_War_II", "WWII_by_country"], fake_members, limit=100
    )
    got = sorted(r.title for r in titles.collect())
    # Template: namespace filtered; Battle of X deduped across categories
    assert got == ["Battle of X", "Battle of Y", "Battle of Z"]


def test_crawl_pipeline_with_injected_fetchers(spark):
    fake_members, fake_fetch = _make_fakes()
    pages = crawl_category(
        spark,
        ["World_War_II", "WWII_by_country"],
        fake_members,
        fake_fetch,
        delay_s=0,  # no politeness sleep in tests
    )
    rows = {r.title: r for r in pages.collect()}
    assert set(rows) == {"Battle of X", "Battle of Y"}  # Z dropped (P8)
    assert rows["Battle of X"].text == "Full text of Battle of X"


def test_fetch_error_tolerance(spark):
    titles = spark.createDataFrame([("Boom",)], ["title"])

    def _raises(title):
        raise RuntimeError("network down")

    pages = fetch_pages(titles, _raises, delay_s=0)
    assert pages.count() == 0  # error -> exists=False -> filtered (O4)


def test_live_ir_datasets_smoke(spark):
    """Integration smoke (r01 verdict item 10): when ir_datasets IS
    installed, drive load_wikir against a real corpus shape once so
    the injectable seam is proven beyond fakes. Skipped in offline CI
    (the lib is absent from this container)."""
    import pytest

    ird = pytest.importorskip("ir_datasets")
    from parquet_extractor_spark.sources.ir_datasets_source import load_wikir

    try:
        df = load_wikir(spark, "wikir/en1k/validation", limit=3)
        rows = df.collect()
    except Exception as exc:  # network/dataset download unavailable
        pytest.skip(f"ir_datasets present but corpus unavailable: {exc}")
    assert 0 < len(rows) <= 3
    assert {"doc_id", "text"} <= set(df.columns)
    assert all(r.doc_id for r in rows)


def test_live_wikipedia_smoke(spark):
    """When mwclient/wikipediaapi are installed, run one real category
    listing + page fetch through the same mapInPandas path the fakes
    exercise. Skipped offline."""
    import pytest

    pytest.importorskip("mwclient")
    pytest.importorskip("wikipediaapi")
    from parquet_extractor_spark.sources.wikipedia import (
        live_fetch_page,
        live_list_members,
    )

    try:
        titles = category_titles(
            spark, ["Physics"], live_list_members(), limit=2
        )
        sample = [r.title for r in titles.collect()]
        assert sample
        pages = fetch_pages(
            spark.createDataFrame([(t,) for t in sample], "title string"),
            live_fetch_page(),
        )
        got = pages.collect()
    except Exception as exc:
        pytest.skip(f"wikipedia libs present but network unavailable: {exc}")
    assert 0 < len(got) <= len(sample)
    assert all((r.text or "") != "" for r in got)
