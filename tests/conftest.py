import pytest

import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus():
    from entity_linking_ray.corpus import make_corpus

    return make_corpus()


@pytest.fixture(scope="session")
def pipeline_output(corpus):
    """Flagship pipeline run once per session on the synthetic corpus."""
    from entity_linking_ray.pipelines.link_and_cluster import run_pipeline

    import pyarrow as pa

    docs = ray.data.from_arrow(corpus["documents"])
    out = run_pipeline(docs, corpus["entities"], hot_cap=100, concurrency=2, num_partitions=4)
    annotated = pa.concat_tables(
        [ray.get(ref) for ref in out["annotated_documents"].to_arrow_refs()]
    )
    return {
        "clusters": out["clusters"].to_pandas(),
        "links": out["links"].to_pandas(),
        "scored_pairs": out["scored_pairs"].to_pandas(),
        "mentions": out["mentions"].to_pandas(),
        "annotated_documents": annotated,
    }
