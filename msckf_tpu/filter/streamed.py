"""Chunked, double-buffered sequence streaming for sequences larger than HBM.

The reference loads the whole dataset into host RAM and loops over it
(`/root/reference/main.py:261`) — device memory is never its constraint.
The TPU build's default path uploads the entire prepared stream up front
(`data/stream.to_device`), which bounds sequence length by HBM. This runner
removes that bound: the host keeps the full stream, and device residency is
limited to two frame chunks plus in-flight outputs.

Pipelining comes for free from JAX's async dispatch: while the compiled scan
for chunk k executes, chunk k+1's host->device upload and chunk k-1's
TickOutput device->host fetch both proceed concurrently — a classic
double-buffer without threads or explicit streams.

Exactness: chunks are padded to a fixed shape with no-op frame blocks
(``imu_valid`` all False, ``has_camera`` False). Propagation treats invalid
ticks as identity transitions with zero process noise
(`filter/propagation.py`), and the camera cond never fires, so the state
passes through padding bit-for-bit and the streamed trajectory is identical
to the monolithic ``run_sequence`` (tested by
``tests/test_streamed.py::test_streamed_matches_monolithic``).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from msckf_tpu.config import MSCKFConfig
from msckf_tpu.filter.msckf import propagate_prefix, run_filter
from msckf_tpu.filter.state import FilterState


def _cast_chunk(d: dict, cfg: MSCKFConfig, device=None) -> dict:
    """Host->device upload of one chunk with the `stream.to_device` dtype
    contract (f64 payloads -> filter dtype, everything else verbatim)."""
    out = {}
    for k, v in d.items():
        v = np.asarray(v)
        arr = v.astype(cfg.dtype) if v.dtype == np.float64 else v
        out[k] = jax.device_put(arr, device)
    return out


def _pad_chunk(chunk: dict, n_pad: int, axis: int = 0) -> dict:
    """Append n_pad no-op frame blocks (all-invalid ticks, no camera) along
    the frame axis."""
    if n_pad == 0:
        return chunk
    out = {}
    for k, v in chunk.items():
        shape = list(v.shape)
        shape[axis] = n_pad
        pad = np.zeros(shape, dtype=v.dtype)
        out[k] = np.concatenate([v, pad], axis=axis)
    return out


@functools.lru_cache(maxsize=None)
def _run_chunk_fn(cfg: MSCKFConfig):
    return jax.jit(
        lambda st, fr: run_filter(cfg, st, fr, assume_camera=False),
        donate_argnums=(0,),
    )


@functools.lru_cache(maxsize=None)
def _prefix_fn(cfg: MSCKFConfig):
    return jax.jit(lambda st, pre: propagate_prefix(cfg, st, pre))


def run_sequence_streamed(
    cfg: MSCKFConfig,
    state: FilterState,
    prefix: dict,
    frames: dict,  # HOST arrays (build_stream output), leading dim C
    chunk_frames: int = 64,
    device=None,
    on_chunk=None,
    on_prefix=None,
):
    """Stream the filter over ``frames`` in fixed-shape chunks.

    Same semantics as ``run_sequence(cfg, state, prefix, frames)`` with
    host-resident data: returns (final_state on device, prefix TickOutput,
    frame TickOutput (C, B, ...)) where the TickOutputs are host numpy
    (they may not fit HBM either — that is the point).

    ``on_chunk(start_frame, chunk_out)``: called with each chunk's host
    TickOutput as soon as it is fetched — i.e. WHILE the next chunk still
    computes on device. This is the live-telemetry hook (the reference
    streams to the Rerun viewer per tick inside its loop,
    `/root/reference/main.py:393-434`; see `utils/viz.LiveRerunStream`).
    """
    C = int(np.asarray(frames["has_camera"]).shape[0])
    if C == 0:
        raise ValueError("frames is empty")
    chunk_frames = min(chunk_frames, C)

    # one compiled executable for every chunk (padding keeps shapes static);
    # pad frames carry has_camera=False, so the per-frame cond stays in.
    # Cached per cfg so repeated calls reuse the compiled program.
    run_chunk = _run_chunk_fn(cfg)
    prefix_fn = _prefix_fn(cfg)

    state, pre_out = prefix_fn(state, _cast_chunk(prefix, cfg, device))
    pre_out_host = jax.device_get(pre_out)
    if on_prefix is not None:
        on_prefix(pre_out_host)

    n_chunks = -(-C // chunk_frames)
    host_chunks = []
    for i in range(n_chunks):
        a, b = i * chunk_frames, min((i + 1) * chunk_frames, C)
        ch = {k: np.asarray(v)[a:b] for k, v in frames.items()}
        host_chunks.append(_pad_chunk(ch, chunk_frames - (b - a)))

    outs_host: list = []

    def fetch(pending):
        prev_out, start, n_real = pending
        host = jax.tree.map(
            lambda x: np.asarray(x)[:n_real], jax.device_get(prev_out)
        )
        outs_host.append(host)
        if on_chunk is not None:
            on_chunk(start, host)

    pending = None  # (device TickOutput, start frame, n_real) not yet fetched
    dev_chunk = _cast_chunk(host_chunks[0], cfg, device)
    for i in range(n_chunks):
        state, out = run_chunk(state, dev_chunk)  # async dispatch
        if i + 1 < n_chunks:
            # overlap the next upload with this chunk's compute
            dev_chunk = _cast_chunk(host_chunks[i + 1], cfg, device)
        if pending is not None:
            # overlap the previous chunk's D2H fetch with this compute
            fetch(pending)
        pending = (out, i * chunk_frames, min(chunk_frames, C - i * chunk_frames))

    fetch(pending)
    frame_out = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs_host)
    return state, pre_out_host, frame_out


@functools.lru_cache(maxsize=None)
def _batched_chunk_fn(cfg: MSCKFConfig):
    from msckf_tpu.parallel.batched import batched_dispatch

    cfg = batched_dispatch(cfg)  # vmapped-path kernel switches (see batched.py)
    fn = lambda st, fr: jax.vmap(
        lambda s, f: run_filter(cfg, s, f, assume_camera=False)
    )(st, fr)
    return jax.jit(fn, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def _batched_prefix_fn(cfg: MSCKFConfig):
    from msckf_tpu.parallel.batched import batched_dispatch

    cfg = batched_dispatch(cfg)
    return jax.jit(
        lambda st, pre: jax.vmap(lambda s, p: propagate_prefix(cfg, s, p))(st, pre)
    )


def run_batched_streamed(
    cfg: MSCKFConfig,
    states: FilterState,  # batched (leading axis B on every leaf)
    prefix: dict,  # HOST arrays, leading dims (B, Tp)
    frames: dict,  # HOST arrays, leading dims (B, C, ...)
    chunk_frames: int = 64,
    sharding=None,  # e.g. NamedSharding(mesh, P('data')) for multi-chip dp
):
    """Batched analog of ``run_sequence_streamed``: stream a BATCH of
    trajectories through the vmapped filter in fixed-shape frame chunks.

    Combines the two scale axes — trajectories wide (vmap/`sharding` over a
    ('data',) mesh, `parallel/batched.py`) and sequences long (HBM-bounded
    chunk streaming). Same semantics as ``batched_run_sequence``; pad frames
    pass states through untouched (the vmapped camera cond lowers to select,
    which discards the unselected branch).

    Returns (final batched state on device, prefix TickOutput, frame
    TickOutput (B, C, ...)) with the TickOutputs as host numpy.
    """
    C = int(np.asarray(frames["has_camera"]).shape[1])
    if C == 0:
        raise ValueError("frames is empty")
    chunk_frames = min(chunk_frames, C)

    run_chunk = _batched_chunk_fn(cfg)
    prefix_fn = _batched_prefix_fn(cfg)

    if sharding is not None:
        states = jax.device_put(states, sharding)
    states, pre_out = prefix_fn(states, _cast_chunk(prefix, cfg, sharding))
    pre_out_host = jax.device_get(pre_out)

    n_chunks = -(-C // chunk_frames)
    host_chunks = []
    for i in range(n_chunks):
        a, b = i * chunk_frames, min((i + 1) * chunk_frames, C)
        ch = {k: np.asarray(v)[:, a:b] for k, v in frames.items()}
        host_chunks.append(_pad_chunk(ch, chunk_frames - (b - a), axis=1))

    outs_host: list = []
    pending = None
    dev_chunk = _cast_chunk(host_chunks[0], cfg, sharding)
    for i in range(n_chunks):
        states, out = run_chunk(states, dev_chunk)
        if i + 1 < n_chunks:
            dev_chunk = _cast_chunk(host_chunks[i + 1], cfg, sharding)
        if pending is not None:
            prev_out, n_real = pending
            outs_host.append(
                jax.tree.map(lambda x: np.asarray(x)[:, :n_real],
                             jax.device_get(prev_out))
            )
        pending = (out, min(chunk_frames, C - i * chunk_frames))

    prev_out, n_real = pending
    outs_host.append(
        jax.tree.map(lambda x: np.asarray(x)[:, :n_real], jax.device_get(prev_out))
    )
    frame_out = jax.tree.map(lambda *xs: np.concatenate(xs, axis=1), *outs_host)
    return states, pre_out_host, frame_out
