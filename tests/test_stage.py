"""Extension surface: Stage protocol, BatchStage adapter, compose,
Pipeline (SURVEY.md §2j).  Kernels are defined inside the tests so
cloudpickle ships them by value (the test module is not importable on
Ray workers)."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from aerial_conversion_ray.stage import BatchStage, Pipeline, Stage, compose


def _kernels():
    def double(t: pa.Table) -> pa.Table:
        return t.set_column(0, "x", pc.multiply(t["x"], 2))

    def inc(t: pa.Table) -> pa.Table:
        return t.set_column(0, "x", pc.add(t["x"], 1))

    return double, inc


def test_batch_stage_and_compose(ray_session):
    double, inc = _kernels()
    ds = ray.data.from_items([{"x": i} for i in range(10)])
    st = compose(BatchStage(double), BatchStage(inc))
    assert isinstance(BatchStage(double), Stage)
    out = sorted(r["x"] for r in st(ds).take_all())
    assert out == sorted(2 * i + 1 for i in range(10))


def test_pipeline_named_chain(ray_session):
    double, inc = _kernels()
    ds = ray.data.from_items([{"x": i} for i in range(5)])
    p = Pipeline("demo").with_stage(BatchStage(inc)).with_stage(BatchStage(double))
    assert p.name == "demo"
    out = sorted(r["x"] for r in p(ds).take_all())
    assert out == sorted((i + 1) * 2 for i in range(5))
