"""Self-supervised XFeat training on TPU (jax/optax).

Produces *functional* weights for the Flax XFeat when the upstream
``xfeat.pt`` checkpoint is unavailable (this environment has no egress).
The recipe mirrors the structure of the upstream training (XFeat paper):

  * dense descriptor loss — dual-softmax InfoNCE between corresponding 1/8
    cells of a homography pair (`msckf_tpu.models.selfsup`);
  * keypoint-head distillation — cross-entropy against a Shi-Tomasi corner
    teacher (the ALIKE-distillation analog);
  * reliability head — regression onto the stop-gradient dual-softmax
    matchability of each cell, like upstream's reliability supervision.

Train: ``python -m msckf_tpu.models.train_xfeat --steps 2000 --out
weights/xfeat_selfsup.npz``. Weights load with ``load_npz_params`` and drop
into ``detect_and_compute`` / ``FeatureExtractor``.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from msckf_tpu.models.xfeat import XFeatModel


# ------------------------------------------------------------- checkpointing


def save_npz_params(path: str, variables: dict) -> None:
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    for kp, leaf in flat:
        key = "/".join(
            getattr(k, "key", getattr(k, "idx", None)) for k in kp
        )
        out[key] = np.asarray(leaf)
    np.savez(path, **out)


def load_npz_params(path: str) -> dict:
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree


# ------------------------------------------------------------------- losses


def _cell_centers(hc: int, wc: int):
    """Pixel xy of each 1/8 cell center."""
    ys, xs = jnp.mgrid[0:hc, 0:wc]
    return jnp.stack([xs * 8.0 + 3.5, ys * 8.0 + 3.5], axis=-1).reshape(-1, 2)


def _apply_h(H, pts):  # (3,3), (N,2) -> (N,2)
    ph = jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), pts.dtype)], -1)
    q = ph @ H.T
    return q[:, :2] / q[:, 2:3]


def pair_losses(f1, f2, kpl1, kpl2, kp1_logits, kp2_logits, rel1, H, size, temp=0.1):
    """Losses for one homography pair (feature maps at 1/8 resolution)."""
    hc, wc = f1.shape[0], f1.shape[1]
    n = hc * wc
    d1 = f1.reshape(n, -1)
    d2 = f2.reshape(n, -1)
    d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True).clip(1e-8)
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True).clip(1e-8)

    # ground-truth correspondence: cell centers of img1 mapped through H,
    # supervised with SOFT bilinear targets over the 4 neighboring cells —
    # subpixel-aware supervision (round 3): every correspondence trains
    # (no round-to-center cutoff) and the target distribution encodes the
    # subcell position, sharpening descriptors between cell centers.
    p1 = _cell_centers(hc, wc)
    p2 = _apply_h(H, p1)  # (n, 2) pixel coords in img2
    c2x = (p2[:, 0] - 3.5) / 8.0
    c2y = (p2[:, 1] - 3.5) / 8.0
    x0 = jnp.floor(c2x).astype(jnp.int32)
    y0 = jnp.floor(c2y).astype(jnp.int32)
    fx = c2x - x0
    fy = c2y - y0

    sim = (d1 @ d2.T) / temp  # (n, n)
    logp12 = jax.nn.log_softmax(sim, axis=1)
    logp21 = jax.nn.log_softmax(sim, axis=0)

    ll = jnp.zeros((n,), f1.dtype)
    p_12 = jnp.zeros((n,), f1.dtype)
    p_21 = jnp.zeros((n,), f1.dtype)
    wsum = jnp.zeros((n,), f1.dtype)
    rows = jnp.arange(n)
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        tx = x0 + dx
        ty = y0 + dy
        w = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
        ok = (tx >= 0) & (tx < wc) & (ty >= 0) & (ty < hc)
        w = jnp.where(ok, w, 0.0)
        t = jnp.clip(ty * wc + tx, 0, n - 1)
        ll = ll + w * (logp12[rows, t] + logp21[rows, t])
        p_12 = p_12 + w * jnp.exp(logp12[rows, t])
        p_21 = p_21 + w * jnp.exp(logp21[rows, t])
        wsum = wsum + w
    valid = wsum > 0.5  # mostly inside img2
    ll = ll / jnp.maximum(wsum, 1e-6)
    desc_loss = -jnp.sum(jnp.where(valid, ll, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )

    # matchability target for the reliability head (stop-gradient)
    match_q = jax.lax.stop_gradient(
        (p_12 / jnp.maximum(wsum, 1e-6)) * (p_21 / jnp.maximum(wsum, 1e-6))
    )
    rel_flat = rel1.reshape(n)
    rel_loss = jnp.sum(
        jnp.where(valid, (rel_flat - match_q) ** 2, 0.0)
    ) / jnp.maximum(jnp.sum(valid), 1)

    # keypoint-head distillation (both images)
    def kp_ce(logits, labels):
        lp = jax.nn.log_softmax(logits.reshape(-1, 65), axis=-1)
        return -jnp.mean(lp[jnp.arange(lp.shape[0]), labels.reshape(-1)])

    kp_loss = 0.5 * (kp_ce(kp1_logits, kpl1) + kp_ce(kp2_logits, kpl2))
    return desc_loss, kp_loss, rel_loss, jnp.sum(valid)


def batch_loss(variables, img1, img2, H, kpl1, kpl2, size):
    model = XFeatModel(train=True)
    x = jnp.concatenate([img1, img2], axis=0)[..., None]
    (feats, kp_logits, rel), updates = model.apply(
        variables, x, mutable=["batch_stats"]
    )
    B = img1.shape[0]
    f1, f2 = feats[:B], feats[B:]
    k1, k2 = kp_logits[:B], kp_logits[B:]
    r1 = rel[:B, :, :, 0]

    d, k, r, nv = jax.vmap(
        lambda a, b, la, lb, ka, kb, ra, h: pair_losses(
            a, b, la, lb, ka, kb, ra, h, size
        )
    )(f1, f2, kpl1, kpl2, k1, k2, r1, H)
    loss = jnp.mean(d) + jnp.mean(k) + 2.0 * jnp.mean(r)
    aux = {
        "desc": jnp.mean(d), "kp": jnp.mean(k), "rel": jnp.mean(r),
        "valid_cells": jnp.mean(nv.astype(jnp.float32)),
    }
    return loss, (aux, updates)


def make_train_step(tx, size):
    @jax.jit
    def step(params, batch_stats, opt_state, img1, img2, H, kpl1, kpl2):
        def lf(p):
            return batch_loss(
                {"params": p, "batch_stats": batch_stats},
                img1, img2, H, kpl1, kpl2, size,
            )

        (loss, (aux, updates)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, upd)
        return params, updates["batch_stats"], opt_state, loss, aux

    return step


# ----------------------------------------------------------------- evaluation


def match_accuracy(variables, rng: np.random.Generator, n_pairs=8, size=256,
                   top_k=200, tol_px=3.0, hard=False):
    """Weights-quality gate: mutual-NN match precision on held-out warps.

    ``hard=False`` evaluates on mild warps (small rotation/scale — the
    frame-to-frame viewpoint change sequential VIO matching actually sees);
    ``hard=True`` uses the full training augmentation (rotation to 0.5 rad,
    scale 0.8-1.25). Returns (precision, mean #matches): fraction of mutual
    matches whose reprojection error through the true homography is < tol_px.
    """
    from msckf_tpu.models.selfsup import make_batch as mb
    from msckf_tpu.models.xfeat import detect_and_compute

    kw = {} if hard else dict(scale=0.08, max_rot=0.1, scale_range=(0.95, 1.05))
    batch = mb(rng, n_pairs, size, **kw)
    fn = jax.jit(functools.partial(detect_and_compute, top_k=top_k))
    precisions, counts = [], []
    for b in range(n_pairs):
        k1, d1, s1, v1 = jax.device_get(fn(variables, jnp.asarray(batch.img1[b])))
        k2, d2, s2, v2 = jax.device_get(fn(variables, jnp.asarray(batch.img2[b])))
        k1, d1 = k1[v1], d1[v1]
        k2, d2 = k2[v2], d2[v2]
        if len(k1) < 8 or len(k2) < 8:
            precisions.append(0.0)
            counts.append(0)
            continue
        sim = d1 @ d2.T
        m12 = sim.argmax(1)
        m21 = sim.argmax(0)
        mutual = m21[m12] == np.arange(len(k1))
        i1 = np.arange(len(k1))[mutual]
        i2 = m12[mutual]
        ph = np.concatenate([k1[i1], np.ones((len(i1), 1))], -1)
        q = ph @ batch.H[b].T
        proj = q[:, :2] / q[:, 2:3]
        err = np.linalg.norm(proj - k2[i2], axis=-1)
        precisions.append(float(np.mean(err < tol_px)) if len(err) else 0.0)
        counts.append(int(len(err)))
    return float(np.mean(precisions)), float(np.mean(counts))


# ----------------------------------------------------------------------- CLI


class PairPool:
    """Pregenerated (texture, warp, labels) pool; draws apply fresh
    photometric jitter only (generation at 0.45 s/batch would otherwise
    dominate the TPU step time)."""

    def __init__(self, rng: np.random.Generator, n_pairs: int, size: int):
        from msckf_tpu.models.selfsup import photometric_jitter

        self._jitter = photometric_jitter
        self.rng = rng
        self.size = size
        self.img1 = np.empty((n_pairs, size, size), np.float32)
        self.img2c = np.empty((n_pairs, size, size), np.float32)  # clean warp
        self.H = np.empty((n_pairs, 3, 3), np.float32)
        hc = size // 8
        self.l1 = np.empty((n_pairs, hc, hc), np.int32)
        self.l2 = np.empty((n_pairs, hc, hc), np.int32)
        for i in range(n_pairs):
            self._generate(i)

    def _generate(self, i: int):
        from msckf_tpu.models.selfsup import (
            joint_corner_labels, random_homography, random_texture, warp_image,
        )

        base = random_texture(self.rng, self.size)
        H = random_homography(self.rng, self.size)
        warped = warp_image(base, H)
        self.img1[i] = base
        self.img2c[i] = warped
        self.H[i] = H
        # H-consistent teacher labels (selfsup.joint_corner_labels) — the
        # round-3 repeatability fix
        self.l1[i], self.l2[i] = joint_corner_labels(base, warped, H)

    def refresh(self, n: int):
        """Regenerate ``n`` random pool entries (keeps the scene distribution
        fresh over a long run instead of overfitting the initial pool)."""
        for i in self.rng.integers(0, len(self.img1), n):
            self._generate(int(i))

    def save(self, path: str) -> None:
        """Persist the pool (images as float16 — the [0, 255] range is
        represented to ~0.1 px-value resolution, far below the jitter noise)
        so a big pool can be pre-generated offline: generation is host-bound
        (~0.3 s/pair on one core) and would stall the TPU step loop."""
        np.savez(
            path,
            img1=self.img1.astype(np.float16),
            img2c=self.img2c.astype(np.float16),
            H=self.H, l1=self.l1, l2=self.l2,
        )

    @classmethod
    def from_file(cls, rng: np.random.Generator, path: str) -> "PairPool":
        from msckf_tpu.models.selfsup import photometric_jitter

        obj = cls.__new__(cls)
        obj._jitter = photometric_jitter
        obj.rng = rng
        data = np.load(path)
        obj.img1 = data["img1"].astype(np.float32)
        obj.img2c = data["img2c"].astype(np.float32)
        obj.H = data["H"]
        obj.l1 = data["l1"]
        obj.l2 = data["l2"]
        obj.size = obj.img1.shape[1]
        return obj

    def draw(self, batch: int):
        idx = self.rng.integers(0, len(self.img1), batch)
        img2 = np.stack([self._jitter(self.rng, self.img2c[j]) for j in idx])
        return (self.img1[idx], img2, self.H[idx], self.l1[idx], self.l2[idx])


def train(steps=2000, batch=8, size=256, lr=1e-3, seed=0, out=None,
          log_every=50, init_variables=None, pool_pairs=400,
          refresh_every=50, refresh_n=8, eval_every=0, pool_file=None):
    """``refresh_every``/``refresh_n``: regenerate refresh_n pool scenes
    every refresh_every steps (full pool turnover every
    pool_pairs/refresh_n * refresh_every steps) so long runs never overfit
    the initial scene draw. ``eval_every`` > 0: run the hard-distribution
    match-precision eval periodically and keep the BEST checkpoint (saved to
    ``out``) instead of the last."""
    import optax

    rng = np.random.default_rng(seed)
    if init_variables is None:
        model = XFeatModel(train=True)
        variables = model.init(jax.random.key(seed), jnp.zeros((1, size, size, 1)))
    else:
        variables = init_variables
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(lr, steps, alpha=0.05)),
    )
    opt_state = tx.init(params)
    step_fn = make_train_step(tx, size)

    t0 = time.perf_counter()
    if pool_file:
        pool = PairPool.from_file(rng, pool_file)
        print(
            f"pair pool loaded ({len(pool.img1)} pairs from {pool_file}): "
            f"{time.perf_counter() - t0:.0f}s",
            flush=True,
        )
    else:
        pool = PairPool(rng, pool_pairs, size)
        print(f"pair pool ({pool_pairs}): {time.perf_counter() - t0:.0f}s", flush=True)

    best = (-1.0, None)
    eval_rng_seed = 999

    def hard_eval(variables):
        p_hard, n_hard = match_accuracy(
            variables, np.random.default_rng(eval_rng_seed), hard=True
        )
        p_mild, _ = match_accuracy(
            variables, np.random.default_rng(eval_rng_seed), hard=False
        )
        return p_hard, p_mild, n_hard

    t0 = time.perf_counter()
    for i in range(steps):
        i1, i2, Hs, l1, l2 = pool.draw(batch)
        params, batch_stats, opt_state, loss, aux = step_fn(
            params, batch_stats, opt_state,
            jnp.asarray(i1), jnp.asarray(i2), jnp.asarray(Hs),
            jnp.asarray(l1), jnp.asarray(l2),
        )
        if refresh_every and i % refresh_every == refresh_every - 1:
            pool.refresh(refresh_n)
        if i % log_every == 0 or i == steps - 1:
            a = jax.device_get(aux)
            print(
                f"step {i:5d} loss {float(loss):.4f} desc {a['desc']:.4f} "
                f"kp {a['kp']:.4f} rel {a['rel']:.4f} "
                f"({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )
        if eval_every and (i % eval_every == eval_every - 1 or i == steps - 1):
            variables = {"params": params, "batch_stats": batch_stats}
            ph, pm, nh = hard_eval(variables)
            marker = ""
            if ph > best[0]:
                best = (ph, jax.device_get(variables))
                marker = "  <- best"
                if out:
                    save_npz_params(out, best[1])
            print(
                f"eval @ step {i}: hard {ph:.3f} mild {pm:.3f} "
                f"({nh:.0f} m/p){marker}",
                flush=True,
            )
    variables = {"params": params, "batch_stats": batch_stats}
    if eval_every and best[1] is not None:
        print(f"best hard-eval {best[0]:.3f} (checkpoint kept)")
        variables = best[1]
    if out:
        save_npz_params(out, variables)
        print(f"weights saved to {out}")
    return variables


def main(argv=None):
    ap = argparse.ArgumentParser(description="Self-supervised XFeat training")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="weights/xfeat_selfsup.npz")
    ap.add_argument("--pool", type=int, default=400)
    ap.add_argument("--resume", default="", help="npz checkpoint to continue from")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--eval_every", type=int, default=0,
                    help="periodic hard-eval cadence; keeps the best checkpoint")
    ap.add_argument("--refresh_every", type=int, default=50)
    ap.add_argument("--pool_file", default="",
                    help="pre-generated PairPool .npz (see PairPool.save); "
                    "overrides --pool")
    args = ap.parse_args(argv)

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    init = load_npz_params(args.resume) if args.resume else None
    variables = train(
        steps=args.steps, batch=args.batch, size=args.size, lr=args.lr,
        seed=args.seed, out=args.out, pool_pairs=args.pool,
        init_variables=init, eval_every=args.eval_every,
        refresh_every=args.refresh_every,
        pool_file=args.pool_file or None,
    )
    if args.eval:
        prec, nm = match_accuracy(variables, np.random.default_rng(999))
        print(f"held-out match precision@3px: {prec:.3f} ({nm:.0f} matches/pair)")


if __name__ == "__main__":
    main()
