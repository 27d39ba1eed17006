"""SECTOR trained-lane tests: analytic-vs-numerical gradient check on
the from-scratch BiLSTM, deterministic fixture convergence, the three
segmentation methods (MAX / BEMD / BEMD_FIXED) over the model's own
predictions and directional hidden states, and Pk quality bounds."""

import os

import numpy as np
import pytest

from texoo_spark.sector import (SectorModel, fixture_documents,
                                sector_segment_document,
                                train_fixture_sector)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    os.environ.setdefault("TEXOO_CACHE_DIR",
                          str(tmp_path_factory.mktemp("sector_cache")))
    return train_fixture_sector()


def test_gradient_check_analytic_vs_numerical():
    """Every parameter's analytic gradient matches central differences
    to <1e-5 relative error — the correctness anchor for the BPTT."""
    m = SectorModel(4, 3, 2, seed=1)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(5, 4))
    y = np.array([0, 1, 1, 0, 1])
    _, grads = m.loss_and_grads(X, y)
    eps = 1e-6
    worst = 0.0
    for k, g in grads.items():
        flat = m.p[k].reshape(-1)
        for idx in range(0, flat.size, max(1, flat.size // 7)):
            orig = flat[idx]
            flat[idx] = orig + eps
            lp, _ = m.loss_and_grads(X, y)
            flat[idx] = orig - eps
            lm, _ = m.loss_and_grads(X, y)
            flat[idx] = orig
            num = (lp - lm) / (2 * eps)
            ana = g.reshape(-1)[idx]
            worst = max(worst, abs(num - ana)
                        / max(1e-8, abs(num) + abs(ana)))
    assert worst < 1e-5


def test_deterministic_init_and_training(model):
    """Same seed -> bit-identical params; fixture accuracy pinned 1.0;
    the disk cache reloads the exact state."""
    a = SectorModel(8, 4, 3, seed=9)
    b = SectorModel(8, 4, 3, seed=9)
    assert all(np.array_equal(a.p[k], b.p[k]) for k in a.p)
    from texoo_spark.sentemb import sentence_embedding_batch
    docs = fixture_documents()
    acc = model.accuracy(
        [sentence_embedding_batch(s, 64) for s, _ in docs],
        [y for _, y in docs])
    assert acc == 1.0
    # the default path loads the bundled resources npz; force_retrain
    # actually trains — bit-equality proves the shipped weights ARE the
    # deterministic training result.
    m2 = train_fixture_sector(force_retrain=True)
    assert all(np.array_equal(m2.p[k], model.p[k]) for k in model.p)


def _pk_vs_gold(segs, n=24, gold_block=8, k=4):
    from texoo_spark.metrics import pk
    hyp = np.zeros(n, int)
    for i, (b, e) in enumerate(segs):
        hyp[b:e] = i
    gold = np.repeat(np.arange(n // gold_block), gold_block)
    return pk(gold.tolist(), hyp.tolist(), k)


PK_GOLDENS = {  # deterministic per-doc Pk (n=24, k=4) — goldens, not bounds
    "max": [0.4, 0.4, 0.2, 0.6, 0.4, 0.6],
    "bemd_fixed": [0.4, 0.4, 0.4, 0.55, 0.5, 0.4],
}


def test_segmentation_methods_on_every_fixture_doc(model):
    """All six fixture docs, both MAX and BEMD_FIXED: exactly 3 segments,
    per-segment topic labels exactly the doc's topic order, per-sentence
    labels exact, and per-doc Pk pinned to its deterministic golden.
    Boundary lag is the reference's own semantics (MAX's running-mean
    hysteresis java:408-437, BEMD's gaussian smoothing java:507-542), and
    Pk at n=24/k=4 charges ~0.1 per lagged sentence — the goldens record
    that honestly rather than asserting a cosmetic threshold."""
    docs = fixture_documents()
    for d, (sents, labels) in enumerate(docs):
        expect_topics = [int(labels[i]) for i in range(0, 24, 8)]
        for method, fc in [("max", None), ("bemd_fixed", 3)]:
            segs, seg_labels, sent_labels = sector_segment_document(
                model.state(), sents, method, fc)
            assert len(segs) == 3, (d, method, segs)
            assert seg_labels == expect_topics, (d, method)
            assert (sent_labels == labels).all(), (d, method)
            assert round(_pk_vs_gold(segs), 4) == \
                PK_GOLDENS[method][d], (d, method, segs)


def test_plain_bemd_runs_and_labels_correctly(model):
    """Unfixed BEMD may over-segment (as the reference's does); every
    produced segment must still carry its true majority topic label."""
    sents, labels = fixture_documents()[0]
    segs, seg_labels, _ = sector_segment_document(model.state(), sents,
                                                  "bemd")
    assert segs and segs[0][0] == 0 and segs[-1][1] == 24
    for (b, e), sl in zip(segs, seg_labels):
        true_majority = np.bincount(labels[b:e]).argmax()
        assert sl == true_majority


def test_unknown_method_raises(model):
    with pytest.raises(ValueError):
        sector_segment_document(model.state(),
                                fixture_documents()[0][0], "nope")
