"""High-level library facade.

One object wrapping the full capability surface so library users don't
touch flax plumbing:

    from neural_marionette_tpu.api import Marionette
    m = Marionette.load("pretrained/aist")          # ours or reference .pth
    det = m.detect(points)                          # keypoints + skeleton
    gen = m.generate(vox_clip, Tcond=5, Tgen=25)    # motion generation
    itp = m.interpolate(vox_clip, anchor_rate=10)   # in-betweening
    ret = m.retarget(source_vox, target_points)     # motion retargeting
"""
from __future__ import annotations

from typing import Iterable, Iterator, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .apps.common import DemoContext, load_pretrained, \
    detect_and_extract_skeleton
from .config import MarionetteConfig
from .models import NeuralMarionette, SkeletonArrays
from .ops import voxelize_np
from .skeleton import Skeleton


class Marionette:
    """Stateful convenience wrapper over the functional stack."""

    def __init__(self, ctx: DemoContext):
        self.ctx = ctx
        self.cfg = ctx.cfg
        self.skeleton: Optional[Skeleton] = ctx.skeleton

    # ------------------------------------------------------------- loading
    @classmethod
    def load(cls, exp_dir: str, **overrides) -> "Marionette":
        return cls(load_pretrained(exp_dir, **overrides))

    @classmethod
    def from_config(cls, cfg: MarionetteConfig, seed: int = 0) -> "Marionette":
        """Random-weight instance (development / training from scratch)."""
        model = NeuralMarionette(cfg)
        g = cfg.grid_size
        example = jnp.zeros((1, 2, g, g, g, 1), jnp.float32)
        params = model.init(
            {"params": jax.random.PRNGKey(seed),
             "sample": jax.random.PRNGKey(seed + 1)},
            example, detector_active=True, learner_active=True,
            skeleton=SkeletonArrays.chain(cfg.nkeypoints))
        return cls(DemoContext(cfg=cfg, model=model, params=params,
                               skeleton=None))

    # ----------------------------------------------------------- inference
    def voxelize(self, points: np.ndarray) -> np.ndarray:
        """(T, N, 3) normalized points -> (T, G, G, G, 1)."""
        return np.stack([voxelize_np(points[t], self.cfg.grid_size)
                         for t in range(points.shape[0])])

    def detect(self, vox_clip: np.ndarray) -> dict:
        """(T, G, G, G, 1) -> keypoints (T, K, 4), heatmaps, affinity,
        skeleton (extracted once and cached)."""
        det, skeleton = detect_and_extract_skeleton(self.ctx, vox_clip)
        if self.skeleton is None:
            self.skeleton = skeleton
        return dict(
            keypoints=np.asarray(det["keypoints"][0]),
            heatmaps=np.asarray(det["heatmaps"][0]),
            recon=np.asarray(det["recon"][0]),
            affinity=np.asarray(det["affinity"]),
            skeleton=skeleton,
        )

    def encode(self, vox_clip: np.ndarray, seed: int = 0) -> dict:
        """Detector + VRNN encode: keypoints, per-frame global rotations."""
        det, skeleton = detect_and_extract_skeleton(self.ctx, vox_clip)
        if self.skeleton is None:
            self.skeleton = skeleton
        sk = SkeletonArrays.from_skeleton(skeleton)
        dyn = self.ctx.model.apply(
            self.ctx.params, det["keypoints"], sk,
            method=lambda m, *a, **k: m.dyna_module.encode(*a, **k),
            rngs={"sample": jax.random.PRNGKey(seed)})
        return dict(keypoints=np.asarray(det["keypoints"][0]),
                    kypt_recon=np.asarray(dyn["kypt_recon"][0]),
                    R=np.asarray(dyn["R"][0]), skeleton=skeleton)

    # --------------------------------------------------------- capabilities
    def generate(self, vox_clip: np.ndarray, Tcond: int = 5, Tgen: int = 25,
                 sample_num: int = 3, seed: int = 2) -> dict:
        from .apps.generation import run_generation
        return run_generation(self.ctx, vox_clip, Tcond=Tcond, Tgen=Tgen,
                              sample_num=sample_num, seed=seed)

    def interpolate(self, vox_clip: np.ndarray, anchor_rate: int = 10,
                    sample_num: int = 10000, seed: int = 2) -> dict:
        from .apps.interpolation import run_interpolation
        return run_interpolation(self.ctx, vox_clip,
                                 anchor_rate=anchor_rate,
                                 sample_num=sample_num, seed=seed)

    def retarget(self, source_vox: np.ndarray, target_points: np.ndarray,
                 hardness: float = 8.0, mode: str = "ours",
                 seed: int = 0) -> dict:
        from .apps.retarget import run_retarget
        return run_retarget(self.ctx, source_vox, target_points,
                            hardness=hardness, mode=mode, seed=seed)

    # ------------------------------------------------------------ streaming
    def stream(self, dtype: str = "bfloat16", sample_num: int = 10,
               seed: int = 2,
               outputs: Sequence[str] = ("keypoints", "kypt_recon", "R"),
               ) -> "MarionetteStream":
        """Streaming serving session (see :class:`MarionetteStream`).

        Uses the cached skeleton if one exists (from a prior ``detect``
        or checkpoint); otherwise the first streamed window extracts it.
        """
        return MarionetteStream(self.ctx, skeleton=self.skeleton,
                                dtype=dtype, sample_num=sample_num,
                                seed=seed, outputs=outputs)


class MarionetteStream:
    """Double-buffered streaming inference over point-cloud windows.

    A serving deployment consumes an endless stream of windows
    ``(B, T, N, 3)`` of raw (normalized) points: host->HBM transfer,
    on-device voxelization, detector encode, VRNN rollout per window.
    This session overlaps window t+1's host->HBM transfer with window
    t's compute (JAX async dispatch), so end-to-end per-window latency
    is ~= the compute alone instead of transfer + compute — measured
    2.16x on hardware (scripts/bench_stream.py; BASELINE.md).

    Results come back lag-1: ``submit(w)`` returns the *previous*
    window's outputs (or None for the first), ``flush()`` drains the
    last; or use ``run(iterable)`` which hides the bookkeeping:

        m = Marionette.load("pretrained/aist")
        with m.stream() as s:
            for result in s.run(window_source()):
                consume(result["keypoints"], result["R"])

    The reference has no serving path at all (its demos are batch
    scripts, vis_generation.py); this is the TPU-native replacement for
    a would-be per-window ``.cuda()`` + forward loop.
    """

    def __init__(self, ctx: DemoContext, skeleton: Optional[Skeleton],
                 dtype: str = "bfloat16", sample_num: int = 10,
                 seed: int = 2,
                 outputs: Sequence[str] = ("keypoints", "kypt_recon", "R")):
        from .ops import voxelize_jnp

        self.ctx = ctx
        self.cfg = ctx.cfg
        self.skeleton = skeleton
        self.outputs = tuple(outputs)
        jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        # same params, compute-dtype override (flax keeps params fp32)
        model = NeuralMarionette(self.cfg, dtype=jdtype)
        G = self.cfg.grid_size
        keep = self.outputs

        def encode_window(params, pts, sk, window_idx):
            # per-window key: otherwise every window would draw IDENTICAL
            # sample noise and best-of-N selections would be correlated
            # across the stream (VERDICT r3 weak #5)
            key = jax.random.fold_in(jax.random.PRNGKey(seed), window_idx)
            vox = voxelize_jnp(pts, G).astype(jdtype)
            out = model.apply(params, vox, sk,
                              method=NeuralMarionette.encode_only,
                              sample_num=sample_num,
                              rngs={"sample": key})
            return {k: out[k] for k in keep}

        self._encode = jax.jit(encode_window)
        self._pending = None  # (device outputs, true B) of window in flight
        self._n_submitted = 0
        self._closed = False

    @staticmethod
    def _bucket(b: int) -> int:
        """Round a batch size up to a compile bucket (1,2,4,8,16,24,32,...)
        so variable-B streams hit a bounded set of compiled programs
        instead of one compile per distinct B."""
        for cap in (1, 2, 4, 8, 16, 24):
            if b <= cap:
                return cap
        return -(-b // 8) * 8  # next multiple of 8 beyond 24

    # ------------------------------------------------------------ plumbing
    def _skeleton_arrays(self, first_window: np.ndarray) -> SkeletonArrays:
        if self.skeleton is None:
            # one-time host round trip: detect + extract on window 0
            vox = self.voxelize_host(first_window[0])
            _, self.skeleton = detect_and_extract_skeleton(self.ctx, vox)
        return SkeletonArrays.from_skeleton(self.skeleton)

    def voxelize_host(self, points: np.ndarray) -> np.ndarray:
        return np.stack([voxelize_np(points[t], self.cfg.grid_size)
                         for t in range(points.shape[0])])

    @staticmethod
    def _fetch(pending) -> dict:
        out, true_b = pending
        return {k: np.asarray(v)[:true_b] for k, v in out.items()}

    # ------------------------------------------------------------- serving
    def submit(self, window: np.ndarray) -> Optional[dict]:
        """Enqueue one ``(B, T, N, 3)`` window; returns the PREVIOUS
        window's results (None on the first call).

        Variable B is supported: the batch is padded up to a compile
        bucket (see `_bucket`) and the pad rows sliced off at fetch, so a
        stream with ragged batch sizes compiles a bounded program set.
        """
        assert not self._closed, "stream already flushed/closed"
        if self._pending is None and self.skeleton is None:
            self._sk = self._skeleton_arrays(window)
        elif not hasattr(self, "_sk"):
            self._sk = SkeletonArrays.from_skeleton(self.skeleton)
        true_b = window.shape[0]
        bucket = self._bucket(true_b)
        if bucket != true_b:
            # pad with the first row repeated: real geometry, so no NaN /
            # empty-voxel corner cases in the padded lanes
            pad = np.broadcast_to(window[:1],
                                  (bucket - true_b,) + window.shape[1:])
            window = np.concatenate([window, pad], axis=0)
        dev = jax.device_put(window)            # transfer (async)
        idx = self._n_submitted
        self._n_submitted += 1
        out = self._encode(self.ctx.params, dev, self._sk,
                           jnp.uint32(idx))     # async dispatch
        prev, self._pending = self._pending, (out, true_b)
        return self._fetch(prev) if prev is not None else None

    def flush(self) -> Optional[dict]:
        """Drain the in-flight window (call once after the last submit)."""
        prev, self._pending = self._pending, None
        self._closed = True
        return self._fetch(prev) if prev is not None else None

    def run(self, windows: Iterable[np.ndarray]) -> Iterator[dict]:
        """Pipeline an iterable of windows; yields one result per window
        in order.  The next window's transfer is issued before the
        previous result is fetched, keeping the device busy."""
        for w in windows:
            res = self.submit(w)
            if res is not None:
                yield res
        tail = self.flush()
        if tail is not None:
            yield tail

    # --------------------------------------------------------- context mgr
    def __enter__(self) -> "MarionetteStream":
        return self

    def __exit__(self, *exc) -> None:
        if not self._closed:
            self.flush()
