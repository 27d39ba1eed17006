"""Segmentation operator tests (construction-based; SURVEY.md F9 strategy).

Block-structured synthetic embeddings with known boundaries must be
recovered by EMD/BEMD; edge algebra mirrors SectorAnnotator.java:442-684.
"""

import numpy as np

from texoo_spark.segment import (
    detect_edges, detect_edges_count, deviation, edges_to_segments,
    gaussian_smooth, segment_bemd, segment_emd, segments_from_newlines,
    segments_from_target_labels,
)


def block_embeddings(sizes, dim=32, seed=7, noise=0.02):
    rng = np.random.RandomState(seed)
    centers = rng.randn(len(sizes), dim) * 2.0
    rows = []
    for i, n in enumerate(sizes):
        for _ in range(n):
            rows.append(centers[i] + rng.randn(dim) * noise)
    return np.array(rows)


def test_edges_to_segments():
    assert edges_to_segments(np.array([1, 0, 0, 1, 0])) == [(0, 3), (3, 5)]
    assert edges_to_segments(np.array([1.0])) == [(0, 1)]
    assert edges_to_segments(np.array([])) == []


def test_detect_edges_local_maxima():
    dev = np.array([0.0, 0.1, 0.9, 0.1, 0.0, 0.5, 0.2])
    edges = detect_edges(dev)
    assert list(np.nonzero(edges)[0]) == [0, 2, 5]


def test_detect_edges_count_picks_highest():
    dev = np.array([0.0, 0.1, 0.9, 0.1, 0.0, 0.5, 0.2])
    edges = detect_edges_count(dev, 2)  # 1 boundary + forced first
    assert list(np.nonzero(edges)[0]) == [0, 2]
    edges3 = detect_edges_count(dev, 3)
    assert list(np.nonzero(edges3)[0]) == [0, 2, 5]


def test_deviation_zero_for_identical():
    m = np.ones((4, 8))
    assert np.allclose(deviation(m), 0.0)


def test_gaussian_smooth_shape_and_locality():
    m = np.zeros((10, 3))
    m[5] = 1.0
    s = gaussian_smooth(m, sd=1.5)
    assert s.shape == (10, 3)
    assert s[5, 0] > s[3, 0] > s[0, 0]


def test_segment_emd_recovers_blocks():
    emb = block_embeddings([8, 8, 8])
    segs = segment_emd(emb)
    # boundaries at 8 and 16 must appear among segment starts
    starts = {s for s, _ in segs}
    assert 0 in starts
    assert any(abs(s - 8) <= 1 for s in starts)
    assert any(abs(s - 16) <= 1 for s in starts)


def test_segment_bemd_fixed_count():
    emb = block_embeddings([6, 6, 6], seed=3)
    segs = segment_bemd(emb, emb[::-1].copy(), fixed_count=3)
    assert len(segs) == 3
    assert segs[0][0] == 0
    assert segs[-1][1] == 18


def test_segments_from_newlines():
    assert segments_from_newlines([False, True, False, False, True]) == \
        [(0, 2), (2, 5)]
    # last sentence without newline still closes a segment (java:394-399)
    assert segments_from_newlines([False, True, False]) == [(0, 2), (2, 3)]


def test_segments_from_target_labels():
    labels = np.eye(3)
    pred = np.array([
        [0.9, 0.1, 0.0], [0.8, 0.2, 0.0],   # label 0
        [0.1, 0.9, 0.0], [0.0, 0.8, 0.2],   # label 1
        [0.0, 0.1, 0.9],                    # label 2
    ])
    segs = segments_from_target_labels(pred, labels, k=1)
    assert segs == [(0, 2), (2, 4), (4, 5)]


def test_segmentation_end_to_end_from_text():
    """Round 2: the full lane the reference's SECTOR pipeline runs —
    sentence texts -> sentence vectors (sentemb producer) -> EMD/BEMD
    segmentation — recovers topic-block structure deterministically."""
    import numpy as np
    from texoo_spark.segment import segment_bemd, segment_emd
    from texoo_spark.sentemb import sentence_embedding_batch
    blocks = [
        ["alpha bravo charlie delta", "bravo charlie delta echo",
         "alpha charlie echo bravo", "delta alpha bravo echo"],
        ["foxtrot golf hotel india", "golf hotel india juliett",
         "foxtrot india juliett golf", "hotel foxtrot golf juliett"],
        ["kilo lima mike november", "lima mike november oscar",
         "kilo november oscar lima", "mike kilo lima oscar"],
    ]
    sents = [s for b in blocks for s in b]
    mat = sentence_embedding_batch(sents)
    assert mat.shape == (12, 64)
    assert np.allclose(np.linalg.norm(mat, axis=1), 1.0)
    # vectors inside a block are closer than across blocks
    within = mat[0] @ mat[1]
    across = mat[0] @ mat[5]
    assert within > across
    # deterministic segmentations (pinned): the fixed-count BEMD lane puts
    # both boundaries within one sentence of the true topic shifts
    assert segment_emd(mat) == [(0, 7), (7, 12)]
    assert segment_bemd(mat, mat, fixed_count=3) == [(0, 4), (4, 10),
                                                     (10, 12)]
