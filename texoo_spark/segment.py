"""Topic segmentation from sentence embeddings (SECTOR post-processing).

numpy reimplementation of the deterministic segmentation methods in
texoo-sector/.../SectorAnnotator.java:369-684 (NL / MAX / EMD / BEMD /
BEMD_FIXED). The neural embeddings themselves come from any embedding
column; the segmentation math below is the operator contract.

Designed to run inside applyInPandas over (conv_id, turn_idx) groups or a
pandas UDF over per-turn embedding arrays.
"""

from __future__ import annotations

import math

import numpy as np


def pca_project(m: np.ndarray, dims: int, normalize: bool = True) -> np.ndarray:
    """Project rows of m onto the top `dims` principal components.

    Mirrors Nd4j PCA.pca_factor usage (SectorAnnotator.java:576-580): the
    factor is computed from a centered (and optionally std-normalized) copy,
    then the ORIGINAL (uncentered) matrix is multiplied by it."""
    x = m.astype(np.float64, copy=True)
    x -= x.mean(axis=0, keepdims=True)
    if normalize:
        std = x.std(axis=0, ddof=1, keepdims=True)
        std[std == 0] = 1.0
        x /= std
    k = min(dims, min(x.shape))
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    factors = vt[:k].T  # features x dims
    out = m.astype(np.float64) @ factors
    if out.shape[1] < dims:
        out = np.pad(out, ((0, 0), (0, dims - out.shape[1])))
    return out


def gaussian_smooth(m: np.ndarray, sd: float = 2.5) -> np.ndarray:
    """Row-wise gaussian-kernel convolution over the time axis
    (SectorAnnotator.gaussianSmooth, java:585-600): smooth[t] = sum_k
    N(k; mean=t, sd).pdf * m[k], with an unnormalized (density) kernel."""
    t_len = m.shape[0]
    idx = np.arange(t_len, dtype=np.float64)
    # kernel[t, k] = normal density at k with mean t
    diff = idx[None, :] - idx[:, None]
    kernel = np.exp(-0.5 * (diff / sd) ** 2) / (sd * math.sqrt(2 * math.pi))
    return kernel @ m.astype(np.float64)


def _cosine_distance(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 1.0  # Nd4j cosineDistance on zero vector -> 1 - 0
    return 1.0 - float(np.dot(a, b) / (na * nb))


def deviation(m: np.ndarray) -> np.ndarray:
    """dev[t] = cosineDistance(m[t], m[t-1]); dev[0] = 0
    (SectorAnnotator.deviation, java:631-640)."""
    t_len = m.shape[0]
    dev = np.zeros(t_len)
    for t in range(1, t_len):
        dev[t] = _cosine_distance(m[t], m[t - 1])
    return dev


def deviation_bidirectional(fw: np.ndarray, bw: np.ndarray) -> np.ndarray:
    """Geometric mean of forward(t,t+1) and backward(t-1,t-2) cosine
    distances (SectorAnnotator.deviation(fw,bw), java:603-626): FW is too
    late, BW is too early; NaN -> 0; dev[0] = 0."""
    t_len = fw.shape[0]
    dev = np.zeros(t_len)
    for t in range(1, t_len):
        fwd1 = _cosine_distance(fw[t], fw[t + 1]) if t < t_len - 1 else 0.0
        bwd1 = _cosine_distance(bw[t - 1], bw[t - 2]) if t > 2 else 0.0
        prod = fwd1 * bwd1
        dev[t] = math.sqrt(prod) if prod >= 0 else 0.0
    return dev


def detect_edges(dev: np.ndarray) -> np.ndarray:
    """Strict local maxima -> 1; position 0 always an edge
    (SectorAnnotator.detectEdges, java:645-656)."""
    t_len = dev.shape[0]
    edges = np.zeros(t_len)
    for t in range(1, t_len - 1):
        if dev[t - 1] < dev[t] and dev[t + 1] < dev[t]:
            edges[t] = 1
    edges[0] = 1
    return edges


def detect_edges_count(dev: np.ndarray, count: int) -> np.ndarray:
    """Pick exactly count-1 highest peaks, then pad with highest magnitudes
    (SectorAnnotator.detectEdges(dev,count), java:658-684; BEMD_FIXED)."""
    t_len = dev.shape[0]
    peaks = np.zeros(t_len)
    for t in range(1, t_len - 1):
        if dev[t - 1] < dev[t] and dev[t + 1] < dev[t]:
            peaks[t] = dev[t]
    edges = np.zeros(t_len)
    # stable descending sort (mergesort keeps first-index priority on ties)
    sorted_peaks = np.argsort(-peaks, kind="stable")
    sorted_mags = np.argsort(-dev, kind="stable")
    for i in range(min(count - 1, t_len)):
        idx = int(sorted_peaks[i])
        if idx == 0:
            continue
        if peaks[idx] == 0.0:
            break
        edges[idx] = 1
    i = 0
    while i < t_len and edges.sum() < count - 1:
        idx = int(sorted_mags[i])
        i += 1
        if idx == 0 or edges[idx] == 1:
            continue
        edges[idx] = 1
    edges[0] = 1
    return edges


def edges_to_segments(edges: np.ndarray) -> list[tuple[int, int]]:
    """Edge flags [Tx1] -> sentence-index segments (start, end_exclusive)
    (SectorAnnotator.applySectionsFromEdges, java:442-482)."""
    t_len = len(edges)
    if t_len == 0:
        return []
    if t_len == 1:
        return [(0, 1)]
    segments = []
    start = 0
    for t in range(1, t_len):
        if edges[t] > 0:
            segments.append((start, t))
            start = t
    segments.append((start, t_len))
    return segments


def segment_emd(embeddings: np.ndarray, pca_dims: int = 16,
                smooth_sd: float = 2.5) -> list[tuple[int, int]]:
    """EMD method (SectorAnnotator.java:487-502): PCA(16) -> gaussian smooth
    (sd=2.5) -> cosine-distance first derivative -> peak edges."""
    if embeddings.shape[0] < 2:
        return [(0, embeddings.shape[0])] if embeddings.shape[0] else []
    x = pca_project(embeddings, pca_dims, normalize=True)
    x = gaussian_smooth(x, smooth_sd)
    dev = deviation(x)
    return edges_to_segments(detect_edges(dev))


def segment_bemd(fw: np.ndarray, bw: np.ndarray, pca_dims: int = 16,
                 smooth_sd: float = 1.5,
                 fixed_count: int | None = None) -> list[tuple[int, int]]:
    """BEMD / BEMD_FIXED (SectorAnnotator.java:507-542): per-direction
    PCA(16), zero first two components, smooth (sd=1.5), geometric-mean
    deviation, peak edges (or exactly fixed_count segments)."""
    t_len = fw.shape[0]
    if t_len < 2:
        return [(0, t_len)] if t_len else []
    fw_p = pca_project(fw, pca_dims, normalize=False)
    bw_p = pca_project(bw, pca_dims, normalize=False)
    fw_p[:, :2] = 0.0
    bw_p[:, :2] = 0.0
    fw_s = gaussian_smooth(fw_p, smooth_sd)
    bw_s = gaussian_smooth(bw_p, smooth_sd)
    dev = deviation_bidirectional(fw_s, bw_s)
    edges = (detect_edges_count(dev, fixed_count) if fixed_count
             else detect_edges(dev))
    return edges_to_segments(edges)


def segments_from_newlines(has_newline: list[bool]) -> list[tuple[int, int]]:
    """NL method: a segment ends at every sentence containing a newline token
    (SectorAnnotator.applySectionsFromNewlines, java:381-401)."""
    segments = []
    start = None
    for i, nl in enumerate(has_newline):
        if start is None:
            start = i
        if nl:
            segments.append((start, i + 1))
            start = None
    if start is not None:
        segments.append((start, len(has_newline)))
    return segments


def attach_segment_labels(predictions: np.ndarray,
                          segments: list[tuple[int, int]],
                          label_matrix: np.ndarray,
                          labels: list[str]) -> list[dict]:
    """A12 (SectorAnnotator.attachVectorsToAnnotations, java:332-363):
    per segment, label = nearest neighbour of the mean sentence prediction;
    heading = top-2 neighbours joined with '/'; confidence = best score."""
    norms = np.linalg.norm(label_matrix, axis=1)
    norms[norms == 0] = 1.0
    lm = label_matrix / norms[:, None]
    out = []
    for s, e in segments:
        mean = predictions[s:e].mean(axis=0)
        n = np.linalg.norm(mean)
        sims = lm @ (mean / n if n > 0 else mean)
        order = np.argsort(-sims, kind="stable")
        out.append({
            "sent_begin": s, "sent_end": e,
            "label": labels[order[0]],
            "heading": "/".join(labels[i] for i in order[:2]),
            "confidence": float(sims[order[0]]),
        })
    return out


def segments_from_target_labels(predictions: np.ndarray,
                                label_matrix: np.ndarray,
                                k: int = 2) -> list[tuple[int, int]]:
    """MAX method (SectorAnnotator.applySectionsFromTargetLabels,
    java:408-437): start a new segment when the running-mean top-1 label of
    the previous sentence is not within the current sentence's top-k labels.

    predictions: [T x L] per-sentence label scores; label_matrix: [L x D]
    identity-like lookup (nearest neighbour by cosine over rows)."""
    t_len = predictions.shape[0]
    if t_len == 0:
        return []
    norms = np.linalg.norm(label_matrix, axis=1)
    norms[norms == 0] = 1.0
    lm = label_matrix / norms[:, None]

    def top_k(vec: np.ndarray, kk: int) -> list[int]:
        v = vec / (np.linalg.norm(vec) or 1.0)
        sims = lm @ v
        return list(np.argsort(-sims, kind="stable")[:kk])

    segments = []
    start = 0
    last_label = -1
    running = np.zeros(predictions.shape[1])
    length = 0
    for t in range(t_len):
        current_top = top_k(predictions[t], k)
        if last_label not in current_top:
            if last_label >= 0:
                segments.append((start, t))
            start = t
            running = np.zeros(predictions.shape[1])
            length = 0
        running += predictions[t]
        length += 1
        last_label = top_k(running / length, 1)[0]
    segments.append((start, t_len))
    return segments
