"""Offline clustering toolbox: PCA-whitening, k-means, PIC, pseudo-labels.

TPU-native replacement for the reference's faiss pipeline
(extras/delores-s/clustering.py): PCA-whitening via XLA eigh instead of
faiss.PCAMatrix (eigen_power=-0.5, :31-40), Lloyd k-means on-device instead
of faiss GpuIndexFlatL2 (:44-88), and Power Iteration Clustering (:117-280)
either on the host (scipy sparse, like the reference) or fully on-device
(`run_pic_device`: gather/scatter matvec + segment-max + pointer doubling).

The `Kmeans` / `PIC` classes keep the reference's `cluster(data)` +
`images_lists` API so DeepCluster-v1-style training (UnifLabelSampler) and
the pseudo-label export (store_clusters.py → UnFuSeD CSV) port over.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pca_whiten(x: np.ndarray, dim: int = 128, eigen_power: float = -0.5) -> np.ndarray:
    """PCA-reduce + whiten + L2-normalize (preprocess_features, :19-40)."""
    x = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(x, axis=0, keepdims=True)
    xc = x - mean
    cov = (xc.T @ xc) / x.shape[0]
    eigval, eigvec = jnp.linalg.eigh(cov)  # ascending
    top = slice(-dim, None)
    w = eigvec[:, top] * jnp.power(jnp.maximum(eigval[top], 1e-10), eigen_power)[None, :]
    out = xc @ w
    out = out / jnp.maximum(jnp.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return np.asarray(out)


def kmeans_l2(
    x: jnp.ndarray, k: int, key: jax.Array, n_iters: int = 20
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Plain Lloyd k-means with L2 distances on device.

    -> (assignments [N], centroids [k, D], final objective). Mirrors the
    faiss Clustering(niter=20) behavior with random-point init.
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)

    # k-means++ seeding (D^2-weighted) — avoids the empty/split clusters a
    # plain random init produces on well-separated data
    def seed_step(carry, i):
        cents, min_d, key = carry
        key, sub = jax.random.split(key)
        probs = jnp.maximum(min_d, 0.0)
        probs = probs / jnp.maximum(jnp.sum(probs), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        c = x[idx]
        cents = cents.at[i].set(c)
        d_new = jnp.sum(jnp.square(x - c[None, :]), axis=1)
        return (cents, jnp.minimum(min_d, d_new), key), None

    key, k0 = jax.random.split(jnp.asarray(key))
    first = x[jax.random.randint(k0, (), 0, n)]
    cents0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)
    d0 = jnp.sum(jnp.square(x - first[None, :]), axis=1)
    (centroids, _, _), _ = jax.lax.scan(
        seed_step, (cents0, d0, key), jnp.arange(1, k)
    )

    def step(centroids, _):
        d = x_sq - 2.0 * x @ centroids.T + jnp.sum(centroids * centroids, axis=1)[None, :]
        assign = jnp.argmin(d, axis=1)
        onehot = (assign[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ x
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids)
        obj = jnp.sum(jnp.min(d, axis=1))
        return new_c, obj

    centroids, objs = jax.lax.scan(step, centroids, None, length=n_iters)
    d = x_sq - 2.0 * x @ centroids.T + jnp.sum(centroids * centroids, axis=1)[None, :]
    assign = jnp.argmin(d, axis=1)
    return assign, centroids, objs[-1]


class Kmeans:
    """Reference-API k-means (clustering.py:91-115): PCA-whiten then cluster."""

    def __init__(self, k: int, pca_dim: int = 128, seed: int = 0):
        self.k = k
        self.pca_dim = pca_dim
        self.seed = seed
        self.images_lists: list[list[int]] = []
        self.centroids: np.ndarray | None = None

    def cluster(self, data: np.ndarray, verbose: bool = False) -> float:
        xb = pca_whiten(data, min(self.pca_dim, data.shape[1]))
        assign, centroids, loss = kmeans_l2(jnp.asarray(xb), self.k, jax.random.key(self.seed))
        assign = np.asarray(assign)
        self.centroids = np.asarray(centroids)
        self.images_lists = [[] for _ in range(self.k)]
        for i, a in enumerate(assign):
            self.images_lists[int(a)].append(i)
        return float(loss)


def knn_graph(x: np.ndarray, nnn: int) -> tuple[np.ndarray, np.ndarray]:
    """(I, D): ids/L2-distances of self + nnn nearest neighbors (make_graph)."""
    xj = jnp.asarray(x, jnp.float32)
    d = (
        jnp.sum(xj * xj, 1, keepdims=True)
        - 2.0 * xj @ xj.T
        + jnp.sum(xj * xj, 1)[None, :]
    )
    neg_d, idx = jax.lax.top_k(-d, nnn + 1)
    return np.asarray(idx), np.maximum(np.asarray(-neg_d), 0.0)


def run_pic(I: np.ndarray, D: np.ndarray, sigma: float = 0.2, alpha: float = 0.001, n_iters: int = 200) -> np.ndarray:
    """Power Iteration Clustering over the NN graph (clustering.py:167-231)."""
    from scipy.sparse import csr_matrix

    v_count, kk = I.shape
    k = kk - 1
    indices = I[:, 1:].reshape(-1)
    indptr = k * np.arange(v_count + 1)
    data = np.exp(-D[:, 1:] / sigma**2).reshape(-1)
    a = csr_matrix((data, indices, indptr), shape=(v_count, v_count))
    w = a + a.T

    v = np.ones(v_count, np.float32) / v_count
    for _ in range(n_iters):
        vnext = w.T.dot(v)
        vnext = alpha * vnext + (1 - alpha) / v_count
        v = vnext / vnext.sum()

    # local-maxima cluster assignment (find_maxima_cluster)
    wc = w.tocsr()
    pointers = np.arange(v_count)
    for i in range(v_count):
        best = 0.0
        for l in range(wc.indptr[i], wc.indptr[i + 1]):
            j = wc.indices[l]
            vi = wc.data[l] * (v[j] - v[i])
            if vi > best:
                best = vi
                pointers[i] = j
    cluster_ids = -np.ones(v_count, np.int64)
    n_clus = 0
    for i in range(v_count):
        if pointers[i] == i:
            cluster_ids[i] = n_clus
            n_clus += 1
    assign = np.zeros(v_count, np.int64)
    for i in range(v_count):
        cur = i
        while pointers[cur] != cur:
            cur = pointers[cur]
        assign[i] = cluster_ids[cur]
    return assign


def _pic_device_impl(I_nb: jnp.ndarray, data: jnp.ndarray, alpha: float, n_iters: int) -> jnp.ndarray:
    """Traced body of :func:`run_pic_device` (see there for the math)."""
    n, k = I_nb.shape
    flat_dst = I_nb.reshape(-1)

    # --- power iteration: v <- normalize(alpha * w v + (1-alpha)/n) --------
    # w = a + a^T is symmetric, so (w v)[i] splits into a gather term over
    # i's own neighbor rows and a scatter-add term from rows that list i.
    def body(v, _):
        fwd = jnp.sum(data * v[I_nb], axis=1)
        rev = jnp.zeros((n,), v.dtype).at[flat_dst].add((data * v[:, None]).reshape(-1))
        vnext = alpha * (fwd + rev) + (1.0 - alpha) / n
        return vnext / jnp.sum(vnext), None

    v0 = jnp.full((n,), 1.0 / n, jnp.float32)
    v, _ = jax.lax.scan(body, v0, None, length=n_iters)

    # --- find_maxima_cluster: pointers[i] = argmax_j w_ij (v_j - v_i) ------
    # Merged symmetric edge weight per directed knn edge (i -> j = I_nb[i,l]):
    # w_ij = a_ij + a_ji, where a_ji exists iff i appears in j's neighbor row.
    rev_w = jnp.sum(data[I_nb] * (I_nb[I_nb] == jnp.arange(n)[:, None, None]), axis=2)
    w_edge = data + rev_w  # [n, k]

    # Candidate targets for each node: its own neighbors (block A) plus every
    # node that lists it as a neighbor (block B) — exactly the nonzeros of
    # row i of w. Scores w_ij (v_j - v_i); host code keeps pointer i unless
    # some score is strictly positive, and ties resolve to the smallest
    # column index (csr column order + strict '>').
    src_a = jnp.repeat(jnp.arange(n), k)
    dst_a = flat_dst
    owners = jnp.concatenate([src_a, dst_a])
    cands = jnp.concatenate([dst_a, src_a])
    w_all = jnp.concatenate([w_edge.reshape(-1)] * 2)
    scores = w_all * (v[cands] - v[owners])

    best = jnp.zeros((n,), scores.dtype).at[owners].max(scores)
    is_max = (scores == best[owners]) & (best[owners] > 0)
    ptr = jnp.full((n,), n, jnp.int32).at[owners].min(jnp.where(is_max, cands, n).astype(jnp.int32))
    pointers = jnp.where(best > 0, ptr, jnp.arange(n, dtype=jnp.int32))

    # --- follow pointer chains by pointer doubling (log-depth) -------------
    def double(p, _):
        return p[p], None

    n_doublings = max(1, int(np.ceil(np.log2(max(n, 2)))))
    roots, _ = jax.lax.scan(double, pointers, None, length=n_doublings)
    is_root = pointers == jnp.arange(n, dtype=jnp.int32)
    cluster_ids = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # ids in node order
    return cluster_ids[roots]


def run_pic_device(
    I: np.ndarray, D: np.ndarray, sigma: float = 0.2, alpha: float = 0.001, n_iters: int = 200
) -> np.ndarray:
    """On-device Power Iteration Clustering — same result as :func:`run_pic`.

    TPU-native formulation of the reference's host/scipy PIC
    (extras/delores-s/clustering.py:167-231): the sparse ``w^T v`` matvec
    becomes a dense [n, k] gather + a scatter-add (duplicate edges sum, like
    csr arithmetic), the per-row local-maxima search becomes a segment-max /
    segment-min pair over the directed edge list, and the sequential pointer
    chase becomes log2(n) rounds of pointer doubling. One jitted program,
    no host round-trips.
    """
    I_nb = jnp.asarray(I[:, 1:], jnp.int32)
    data = jnp.exp(jnp.asarray(-D[:, 1:], jnp.float32) / sigma**2)
    impl = jax.jit(partial(_pic_device_impl, alpha=alpha, n_iters=n_iters))
    return np.asarray(impl(I_nb, data))


class PIC:
    """Reference-API PIC (clustering.py:232-280).

    ``device=True`` runs the power iteration, maxima search, and pointer
    chase on-device (:func:`run_pic_device`); the default keeps the
    reference's host path (it is an offline analysis tool there too).
    """

    def __init__(
        self,
        sigma: float = 0.2,
        nnn: int = 5,
        alpha: float = 0.001,
        distribute_singletons: bool = True,
        device: bool = False,
    ):
        self.sigma = sigma
        self.nnn = nnn
        self.alpha = alpha
        self.distribute_singletons = distribute_singletons
        self.device = device
        self.images_lists: list[list[int]] = []

    def cluster(self, data: np.ndarray, verbose: bool = False) -> int:
        xb = pca_whiten(data, min(128, data.shape[1]))
        I, D = knn_graph(xb, self.nnn)
        pic_fn = run_pic_device if self.device else run_pic
        clust = pic_fn(I, D, self.sigma, self.alpha)
        images_lists: dict[int, list[int]] = {}
        for idx, c in enumerate(clust):
            images_lists.setdefault(int(c), []).append(idx)
        if self.distribute_singletons:
            moves = {}
            for c, members in images_lists.items():
                if len(members) == 1:
                    s = members[0]
                    for n in I[s, 1:]:
                        if len(images_lists.get(int(clust[n]), [])) != 1:
                            moves[s] = int(clust[n])
                            break
            for s, c in moves.items():
                images_lists[int(clust[s])].remove(s)
                images_lists[c].append(s)
        self.images_lists = [m for m in images_lists.values() if m]
        return 0


def uniform_label_epoch(images_lists: list[list[int]], n: int, rng: np.random.Generator) -> np.ndarray:
    """UnifLabelSampler equivalent (src/utils/utils.py:105-148): an epoch of
    indices sampled uniformly over pseudo-label clusters."""
    nonempty = [l for l in images_lists if len(l)]
    per = n // len(nonempty) + 1
    res = np.concatenate(
        [rng.choice(l, per, replace=len(l) <= per) for l in nonempty]
    )
    rng.shuffle(res)
    res = res.astype(np.int64)
    if len(res) >= n:
        return res[:n]
    return np.concatenate([res, res[: n - len(res)]])
