"""Group-wise soft-vote matching (the matchAllToAll path).

Port of msNearestNeighborApproximateInit / SearchSelf
(feat_common/featMatchUtilities.cpp:1428-1819) and matchAllToAll
(featMatchMultiple/featMatchMultiple.cpp:17-145), with FLANN's approximate
kd-tree replaced by exact MXU kNN (sift3d.match.knn). The reference's
OpenMP image chunks become a single batched query sweep.

Semantics replicated (with the snapshot's index/weight pairing bug fixed to
its evident intent, SURVEY.md section 3.4):

- optional geometry concatenation: descriptor ++ weight * xyz / scale
  (:1437-1442, 1530-1539)
- label prior with add-one smoothing (:1486-1497), leave-one-image-out
  adjustment during each image's search (:1597-1599)
- per query: up to k neighbors from *other* images, at most one per target
  image, in ascending distance order (:1647-1669)
- appearance weights exp(-(d/d_min)^2) on squared-L2 distances, d_min =
  first non-zero accepted distance (:1697-1705)
- SoftMax-log normalization: w /= sum w; w = log(w + eta)/log(eta + 1)
  (:1721-1730)
- best-vote-wins dedup per database feature within a query image; vote
  counts increment only on first vote (:1764-1786)
- per-label log-likelihood accumulation (:1798-1809)
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from sift3d.core.config import DEFAULT_CONFIG, SiftConfig
from sift3d.core.featureset import FeatureSet
from sift3d.match.knn import knn_search_tiled


@dataclasses.dataclass
class GroupVoteResult:
    votes: np.ndarray  # [n_img, n_labels] summed soft-vote weights
    counts: np.ndarray  # [n_img, n_labels] distinct voted db features
    log_likelihood: np.ndarray  # [n_img, n_labels]


class GroupMatcher:
    """Concatenated-descriptor database over all images."""

    def __init__(
        self,
        feature_sets: Sequence[FeatureSet],
        labels: Optional[Sequence[int]] = None,
        geometry_weight: float = -1.0,
        cfg: SiftConfig = DEFAULT_CONFIG,
        mesh=None,
    ):
        self.cfg = cfg
        # optional jax.sharding.Mesh: shards the kNN sweep over its first
        # axis — the TPU analogue of the reference's OpenMP image chunks
        # (featMatchMultiple.cpp:9,108-117)
        self.mesh = mesh
        self.n_img = len(feature_sets)
        self.labels = np.asarray(
            labels if labels is not None else np.arange(self.n_img), dtype=np.int64
        )
        self.n_labels = int(self.labels.max()) + 1 if self.n_img else 0

        descs, feat_img, feat_label = [], [], []
        for i, fs in enumerate(feature_sets):
            d = fs.desc.astype(np.float32).copy()
            if geometry_weight > 0:
                # geometry replaces the first 3 descriptor dims in the
                # reference (:1530-1539); we append instead (the intent is
                # extra geometry dimensions; appending keeps appearance)
                g = geometry_weight * fs.xyz / fs.scale[:, None]
                d = np.concatenate([d, g.astype(np.float32)], axis=1)
            descs.append(d)
            feat_img.append(np.full(len(fs), i, np.int64))
            feat_label.append(np.full(len(fs), self.labels[i], np.int64))
        self.db = np.concatenate(descs) if descs else np.zeros((0, 64), np.float32)
        self.feat_img = np.concatenate(feat_img) if feat_img else np.zeros(0, np.int64)
        self.feat_label = np.concatenate(feat_label) if feat_label else np.zeros(0, np.int64)
        self.img_start = np.zeros(self.n_img + 1, np.int64)
        for i, fs in enumerate(feature_sets):
            self.img_start[i + 1] = self.img_start[i] + len(fs)

        # label prior with add-one smoothing (:1486-1497)
        counts = np.bincount(self.feat_label, minlength=self.n_labels).astype(np.float64)
        counts += 1.0
        self.label_prior = counts / counts.sum()
        self.total_prior_denom = float(len(self.feat_img) + self.n_labels)

    def search_image(self, img_idx: int, knn_dists=None, knn_idx=None) -> GroupVoteResult:
        """SearchSelf for one image; returns its vote/count/LL rows.

        Delegates to the batched all-query core (`_vote_all`) with a
        constant query-image map; `_search_image_loop` below is the
        direct line-by-line port kept as the oracle for tests.
        """
        k = min(self.cfg.knn_neighbors, len(self.feat_img))
        lo, hi = self.img_start[img_idx], self.img_idx_end(img_idx)
        queries = self.db[lo:hi]
        if knn_dists is None:
            import jax.numpy as jnp

            knn_dists, knn_idx = knn_search_tiled(queries, jnp.asarray(self.db), k)
        idx = np.asarray(knn_idx)[:, :k]
        dist = np.asarray(knn_dists)[:, :k].astype(np.float64)
        q_img = np.full(idx.shape[0], img_idx, np.int64)
        votes, counts, ll = self._vote_all(dist, idx, q_img)
        return GroupVoteResult(
            votes=votes[img_idx][None],
            counts=counts[img_idx][None],
            log_likelihood=ll[img_idx][None],
        )

    def _vote_all(self, dist: np.ndarray, idx: np.ndarray, q_img: np.ndarray):
        """Batched SearchSelf over an arbitrary mixed-image query set.

        One numpy pass over all queries at once — the reference's
        per-image OpenMP chunks (featMatchMultiple.cpp:108-117) and the
        round-4 per-image Python loop both collapse into segment
        reductions keyed on the query's image. Semantics identical to
        `_search_image_loop` (oracle-tested): the per-(query-image)
        best-vote dedup becomes a np.unique over combined
        (query image, db feature) keys, the leave-one-image-out prior a
        [n_img, n_labels] table indexed per query.

        Returns (votes, counts, ll), each [n_img, n_labels]; images with
        no queries in `q_img` get zero rows.
        """
        cfg = self.cfg
        n_img, n_labels = self.n_img, self.n_labels
        votes = np.zeros((n_img, n_labels), np.float64)
        counts = np.zeros((n_img, n_labels), np.int64)
        ll = np.zeros((n_img, n_labels), np.float64)
        q, k = idx.shape
        if q == 0 or k == 0:
            return votes, counts, ll

        img = self.feat_img[idx]  # [Q, k]
        lab = self.feat_label[idx]
        own = img == q_img[:, None]
        # one vote per target image, ascending-distance order: drop j if any
        # earlier accepted j' hits the same image (k is tiny: k^2 compare)
        acc = ~own
        for j in range(1, k):
            dup = np.zeros(q, bool)
            for jp in range(j):
                dup |= acc[:, jp] & (img[:, jp] == img[:, j])
            acc[:, j] &= ~dup

        dpos = np.where(acc & (dist > 0), dist, np.inf)
        min_dist = dpos.min(axis=1)
        min_dist = np.where(np.isfinite(min_dist), min_dist, 1.0)  # (:1697 fallback)

        w = np.where(acc, np.exp(-((dist / min_dist[:, None]) ** 2)), 0.0)
        sw = w.sum(axis=1)
        ok = sw > 0
        wn = np.zeros_like(w)
        wn[ok] = np.log(w[ok] / sw[ok, None] + cfg.softvote_eta) / np.log(cfg.softvote_eta + 1.0)

        # leave-one-image-out priors, one row per query image (:1597-1599)
        n_per_img = (self.img_start[1:] - self.img_start[:-1]).astype(np.float64)
        priors = np.tile(self.label_prior, (n_img, 1))
        np.subtract.at(priors, (np.arange(n_img), self.labels),
                       n_per_img / self.total_prior_denom)

        use = acc & ok[:, None]
        fi = idx[use]
        wv = wn[use]
        qi = np.broadcast_to(q_img[:, None], idx.shape)[use]
        if fi.size:
            # best-vote-wins dedup per (query image, db feature) (:1764-1786)
            key = qi * np.int64(len(self.feat_img)) + fi
            uniq, inv = np.unique(key, return_inverse=True)
            maxw = np.full(uniq.shape, -np.inf)
            np.maximum.at(maxw, inv, wv)
            uimg = (uniq // len(self.feat_img)).astype(np.int64)
            ulab = self.feat_label[uniq % len(self.feat_img)]
            np.add.at(votes, (uimg, ulab), maxw)
            np.add.at(counts, (uimg, ulab), 1)

        # per-query label log-likelihood (:1767-1809)
        qsel = np.nonzero(ok)[0]
        if qsel.size:
            p_q = priors[q_img]  # [Q, n_labels]
            expo = dist / (min_dist[:, None] + 1.0)
            contrib = np.where(use, np.exp(-(expo**2)), 0.0) / np.take_along_axis(
                p_q, lab, axis=1
            )
            lcounts = p_q[qsel].copy()
            np.add.at(lcounts, (np.repeat(np.arange(len(qsel)), k), lab[qsel].ravel()),
                      contrib[qsel].ravel())
            ll_rows = np.log(lcounts / lcounts.sum(axis=1, keepdims=True))
            np.add.at(ll, q_img[qsel], ll_rows)

        return votes, counts, ll

    def _search_image_loop(self, img_idx: int, knn_dists=None, knn_idx=None) -> GroupVoteResult:
        """Line-by-line port of msNearestNeighborApproximateSearchSelf (oracle)."""
        cfg = self.cfg
        k = min(cfg.knn_neighbors, len(self.feat_img))
        lo, hi = self.img_start[img_idx], self.img_idx_end(img_idx)
        queries = self.db[lo:hi]
        if knn_dists is None:
            import jax.numpy as jnp

            knn_dists, knn_idx = knn_search_tiled(queries, jnp.asarray(self.db), k)

        # leave-one-image-out prior adjustment (:1597-1599)
        img_label = int(self.labels[img_idx])
        prior = self.label_prior.copy()
        prior[img_label] -= (hi - lo) / self.total_prior_denom

        votes = np.zeros(self.n_labels, np.float64)
        counts = np.zeros(self.n_labels, np.int64)
        ll = np.zeros(self.n_labels, np.float64)
        voted: dict = {}  # db feature -> (best weight, label)

        for qi in range(hi - lo):
            res_idx = knn_idx[qi]
            res_dist = knn_dists[qi]
            accepted: List[int] = []
            acc_dist: List[float] = []
            seen_imgs = set()
            min_dist = -1.0
            for j in range(min(k, len(res_idx))):
                fi = int(res_idx[j])
                im = int(self.feat_img[fi])
                if im == img_idx:
                    continue  # own image excluded (:1654)
                if im in seen_imgs:
                    continue  # one vote per target image (:1659-1663)
                accepted.append(fi)
                dj = float(res_dist[j])
                acc_dist.append(dj)
                if dj > 0 and (min_dist < 0 or dj < min_dist):
                    min_dist = dj
                seen_imgs.add(im)
            if not accepted:
                continue

            w = np.asarray(acc_dist, np.float64)
            if min_dist <= 0:
                min_dist = 1.0
            w = np.exp(-((w / min_dist) ** 2))
            sw = w.sum()
            if sw <= 0:
                continue  # (:1746-1748)
            w = np.log(w / sw + cfg.softvote_eta) / np.log(cfg.softvote_eta + 1.0)

            # per-query label-likelihood accumulation (:1767-1809)
            lcounts = prior.copy()
            for j, fi in enumerate(accepted):
                lab = int(self.feat_label[fi])
                expo = acc_dist[j] / (min_dist + 1.0)
                lcounts[lab] += np.exp(-expo * expo) / prior[lab]

                # best-vote dedup per db feature (:1764-1786)
                prev = voted.get(fi)
                if prev is not None:
                    if w[j] > prev:
                        if prev > 0:
                            votes[lab] -= prev
                        votes[lab] += w[j]
                        voted[fi] = w[j]
                else:
                    votes[lab] += w[j]
                    counts[lab] += 1
                    voted[fi] = w[j]
            ll += np.log(lcounts / lcounts.sum())

        out = GroupVoteResult(
            votes=votes[None], counts=counts[None], log_likelihood=ll[None]
        )
        return out

    def img_idx_end(self, i: int) -> int:
        return int(self.img_start[i + 1])

    def match_all_to_all(self) -> GroupVoteResult:
        """All images vs the database; one batched kNN then host vote logic."""
        import jax.numpy as jnp

        k = min(self.cfg.knn_neighbors, len(self.feat_img))
        if self.mesh is not None and len(self.db) and k:
            # mesh path: queries sharded over the first mesh axis, database
            # replicated via ICI all_gather semantics (dist/gather.py) —
            # same results as the single-device sweep (tested), N-way faster
            from sift3d.dist.gather import sharded_knn

            axis = self.mesh.axis_names[0]
            n = self.mesh.shape[axis]
            pad = (-len(self.db)) % n
            qp = np.pad(self.db, ((0, pad), (0, 0))) if pad else self.db
            dists, idx = sharded_knn(qp, jnp.asarray(self.db), k, self.mesh, axis)
            dists, idx = dists[: len(self.db)], idx[: len(self.db)]
        else:
            # knn_search_tiled batches all tiles' device fetches and returns
            # host arrays, so the per-image slices below are free
            dists, idx = knn_search_tiled(self.db, jnp.asarray(self.db), k)
        if k == 0 or not len(self.db):
            z = np.zeros((self.n_img, self.n_labels))
            return GroupVoteResult(z.copy(), z.astype(np.int64), z.copy())
        votes, counts, ll = self._vote_all(
            np.asarray(dists)[:, :k].astype(np.float64),
            np.asarray(idx)[:, :k],
            self.feat_img,
        )
        return GroupVoteResult(votes=votes, counts=counts, log_likelihood=ll)


def touch_report_all(path: str = "report.all.txt") -> None:
    """Create (truncate) the group matcher's report.all.txt.

    The reference opens this file when the FLANN search structure is
    built (msNearestNeighborApproximateInit, featMatchUtilities.cpp:1561)
    and closes it on Delete (:1569) — no fprintf ever targets it in this
    snapshot, so its on-disk parity artifact is an empty file created at
    group-matcher init. Kept as an explicit helper (called by the CLI's
    --all-to-all path) rather than a GroupMatcher side effect so library
    users don't get files dropped into their CWD.
    """
    open(path, "wt").close()


def write_vote_files(
    result: GroupVoteResult,
    votes_path: str = "matching_votes.txt",
    counts_path: str = "vote_count.txt",
    tag: str = "Peak and Valley",
    append: bool = False,
) -> None:
    """matching_votes.txt / vote_count.txt (featMatchMultiple.cpp:119-140)."""
    mode = "at" if append else "wt"
    with open(votes_path, mode) as fv, open(counts_path, mode) as fc:
        fv.write(tag + "\n")
        fc.write(tag + "\n")
        for i in range(result.votes.shape[0]):
            fv.write("".join("%f\t" % v for v in result.votes[i]) + "\n")
            fc.write("".join("%d\t" % c for c in result.counts[i]) + "\n")
        fv.write("\n")
        fc.write("\n")
