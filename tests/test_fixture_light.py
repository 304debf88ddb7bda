"""The fixture-light corpus (our JOB-light): exact plane must match
the golden counts EXACTLY; the model plane must hit the reference's
published q-error class (median well under 2) with a relationship
ensemble."""

from __future__ import annotations

import numpy as np
import pytest

from deepdb_public_spark.benchmarks import load_fixture_light
from deepdb_public_spark.engine import Engine
from deepdb_public_spark.spn.ensemble import SPNEnsemble
from deepdb_public_spark.spn.trainer import train_spn_model
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark, SF_CORRECT)


def test_exact_plane_matches_golden_counts(engine):
    for sql, true in load_fixture_light():
        got = engine.query(sql).collect()[0][0]
        assert got == true, f"{sql}: {got} != {true}"


def test_model_plane_qerror_on_corpus(engine):
    # D6 singles + D7 relationship models ONLY: the 3-table corpus
    # queries must be answered via multi-SPN factorization (B11) —
    # no dedicated join model exists for them
    ens = SPNEnsemble(engine.schema)
    for ts in [
        {"lineitem"},
        {"orders"},
        {"customer"},
        {"part"},
        {"supplier"},
        {"nation"},
        {"region"},
        {"events"},
        {"orders", "lineitem"},
        {"customer", "orders"},
        {"part", "lineitem"},
        {"supplier", "lineitem"},
        {"customer", "nation"},
    ]:
        ens.add_model(train_spn_model(engine.catalog, engine.schema, ts, 60_000))
    engine.ensemble = ens
    qerrs = []
    for sql, true in load_fixture_light():
        est = ens.cardinality(engine.parse(sql))
        qerrs.append(max(est / max(true, 1), true / max(est, 1e-9)))
    qerrs = np.array(qerrs)
    med, p95, mx = np.median(qerrs), np.percentile(qerrs, 95), qerrs.max()
    print(f"fixture-light q-error: median={med:.3f} p95={p95:.3f} max={mx:.3f}")
    assert med <= 1.3, f"median q-error {med}"
    assert p95 <= 3.0, f"p95 q-error {p95}"
