"""Keypoint detector: voxel encoder, keypoint head, voxel decoder, affinity.

TPU-native re-design of reference `model/kypt_detector.py`.  The key
structural change: the reference runs its conv stacks frame-by-frame in
Python loops (kypt_detector.py:330-353 and :404-411); here the time axis is
folded into the batch (``(B, T, ...) -> (B*T, ...)``) so the whole sequence
goes through one batched conv stack, keeping the MXU busy and letting XLA
fuse across frames.  Gaussian rendering is one broadcast op over (B, T, K)
instead of a K x T Python loop.

Layouts are channels-last (``(B, T, X, Y, Z, C)``).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax.linen.initializers import normal, zeros_init

from ..config import MarionetteConfig
from ..ops.coords import add_coord_channels
from ..ops.keypoints import extract_keypoints_from_heatmap, \
    render_gaussian_maps
from ..ops import losses as L
from .blocks import (Basic3DBlock, Res3DBlock, Pool3DBlock, Hourglass,
                     Conv, PLAIN_CONV_INIT, group_norm, leaky_relu)


def _fold_time(x):
    """(B, T, ...) -> (B*T, ...)"""
    return x.reshape((-1,) + x.shape[2:])


def _unfold_time(x, B, T):
    return x.reshape((B, T) + x.shape[1:])


def _resolve_frame_chunk(cfg) -> int:
    fc = cfg.frame_chunk
    if fc == -1:
        return 128 if jax.default_backend() == "tpu" else 0
    return fc


def _apply_frame_chunked(fn, x, chunk: int):
    """Apply a frame-parallel conv stack over the folded (B*T) axis as a
    zero-pad head plus a sub-chunk tail.

    XLA's batch-minor layouts pad the folded frame count to the next
    128-lane multiple on every large conv temp, so N=160 frames costs 256
    frames of HBM traffic (the measured B=16 cliff, BASELINE.md).  The
    head ((N//chunk)*chunk frames) tiles the lanes exactly; the tail
    (< chunk frames) re-enters ``fn`` where the existing shape-static
    strip gate routes it lane-packed (frame-count-independent layout).
    Frames are independent through the stacks, so this is exact.

    ``fn`` may return a single array or a tuple; all leading axes are the
    folded frame axis.
    """
    N = x.shape[0]
    if chunk <= 0 or N <= chunk:
        return fn(x)
    head = (N // chunk) * chunk
    if head == N:
        return fn(x)
    ha, ta = fn(x[:head]), fn(x[head:])
    if isinstance(ha, tuple):
        return tuple(jnp.concatenate([h, t], axis=0)
                     for h, t in zip(ha, ta))
    return jnp.concatenate([ha, ta], axis=0)


class FeatureNet(nn.Module):
    """Voxel -> feature pyramid at grid/4 resolution.

    Reference `_build_feature_net` (kypt_detector.py:264-272):
    Basic(k5, C/4) -> Pool/2 -> Res(C/2) -> Pool/2 -> HG(C/2) -> Res(C).

    ``remat_stages`` checkpoints each block individually (class-level
    nn.remat keeps module auto-names, so the parameter tree is
    unchanged) — bounds the backward peak to one block's activations.
    """
    out_channels: int
    grid_size: int
    dtype: jnp.dtype = jnp.float32
    remat_stages: bool = False
    split_coords: bool = False  # input arrives WITHOUT coord channels
    use_strip: bool = False     # strip-packed 64^3 front (stem + pool)
    strip_max_frames: int = 0   # 0 = env NM_STRIP_MAX_FRAMES or 64

    @nn.compact
    def __call__(self, x):
        C = self.out_channels
        # class-level nn.remat renames children (Checkpoint<cls>_i), so
        # names are pinned to the un-wrapped auto-names explicitly
        wrap = nn.remat if self.remat_stages else (lambda cls: cls)

        # Strip-packed front end: the full-grid stages (stem k5 conv,
        # GN, pool) run lane-packed so the C=32 @64^3 tensors use all
        # 128 MXU lanes instead of 32/128 (4x HBM padding waste).
        # Measured at 40 frames bf16 (scripts/bench_encoder_parts.py):
        # stem fwd 9.6 -> 5.5 ms / wgrad 17.9 -> 2.7 ms (coord-split
        # one-frame field), pool 4.5 -> 2.2 ms.  Unpacks at grid/2 where
        # tensors are 8x smaller.  Res blocks measured ~par (1.14x) and
        # stay plain.
        stem_C = C // 4
        S = max(128 // stem_C, 1)
        while S > 2 and self.grid_size % (2 * S) != 0:
            S //= 2
        # S >= 2: the k5 halo (2 planes) must fit in one neighbour strip;
        # grid % 2S == 0: strip_pool2 consumes strip pairs
        strip_ok = S >= 2 and self.grid_size % (2 * S) == 0
        # same frame-count crossover as the decoder: at >= ~128 folded
        # frames XLA's batch-minor conv layouts fix lane starvation on
        # their own (BASELINE.md)
        import os
        max_frames = self.strip_max_frames or int(
            os.environ.get("NM_STRIP_MAX_FRAMES", "64"))
        if self.use_strip and self.split_coords and strip_ok \
                and x.shape[0] <= max_frames:
            from ..ops.stripconv import pack_strips, unpack_strips
            xp = pack_strips(x, S)
            xp = wrap(Basic3DBlock)(stem_C, 5, dtype=self.dtype,
                                    split_coords=True, strip=S,
                                    name="Basic3DBlock_0")(xp)
            xp = wrap(Pool3DBlock)(2, dtype=self.dtype, strip=S,
                                   name="Pool3DBlock_0")(xp)
            x = unpack_strips(xp, S)
        else:
            x = wrap(Basic3DBlock)(stem_C, 5, dtype=self.dtype,
                                   split_coords=self.split_coords,
                                   name="Basic3DBlock_0")(x)
            x = wrap(Pool3DBlock)(2, dtype=self.dtype,
                                  name="Pool3DBlock_0")(x)
        x = wrap(Res3DBlock)(C // 2, dtype=self.dtype,
                             name="Res3DBlock_0")(x)
        x = wrap(Pool3DBlock)(2, dtype=self.dtype, name="Pool3DBlock_1")(x)
        x = wrap(Hourglass)(C // 2, N=self.grid_size // 4,
                            dtype=self.dtype, name="Hourglass_0")(x)
        x = wrap(Res3DBlock)(C, dtype=self.dtype, name="Res3DBlock_1")(x)
        return x


class HeatmapHead(nn.Module):
    """1x1 conv + softplus/leaky head (kypt_detector.py:273-280)."""
    nkeypoints: int
    act: str = "softplus"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.nkeypoints, (1, 1, 1), kernel_init=PLAIN_CONV_INIT,
                    bias_init=zeros_init(), dtype=self.dtype)(x)
        if self.act == "softplus":
            return jax.nn.softplus(x)
        return leaky_relu(x)


class VoxToKyptNet(nn.Module):
    """Per-frame voxel encoder + spatial-softmax keypoint extraction.

    Reference `VoxToKyptNet` (kypt_detector.py:244-365) with the frame loop
    replaced by a folded batch.  ``const_intensity`` modes:
      0: per-frame heatmaps only (softplus head);
      1: learned initial heatmap prior, recurrently updated;
      2: spatio-temporal (sequence-mean) prior, recurrently updated;
      3: spatio-temporal prior, constant across frames (shipped config);
      4: motion-saliency weighted prior, constant across frames.
    Modes 3/4 stay fully frame-parallel; modes 1/2 need only a cheap
    ``lax.scan`` for the 1x1 propagate fusion (the conv stack itself still
    runs batched).
    """
    cfg: MarionetteConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.feat_dim = cfg.feat_dim
        self.heat_grid = cfg.grid_size // 4
        ci = cfg.const_intensity
        # jax.checkpoint on the conv pyramids trades recompute for HBM so
        # larger B*T fits during training (cfg.remat)
        # remat=1: checkpoint whole conv pyramids (best at small batch);
        # remat=2: additionally checkpoint each stage (bounds the backward
        # peak to one stage — measured 16.2G vs 26G+ for B=8 accum=1, at
        # the cost of ~2G extra at B=4; see BASELINE.md)
        feature_cls = nn.remat(FeatureNet) if cfg.remat else FeatureNet
        # split_coords: the coord channels enter inside the stem (see
        # Basic3DBlock) — same params, same math; enables the strip
        # front end's one-frame coordinate field
        se = cfg.strip_encoder
        use_strip_enc = (jax.default_backend() == "tpu") if se == -1 \
            else bool(se)
        self.extract_features = feature_cls(self.feat_dim, cfg.grid_size,
                                            dtype=self.dtype,
                                            remat_stages=cfg.remat >= 2,
                                            split_coords=True,
                                            use_strip=use_strip_enc,
                                            strip_max_frames=
                                            cfg.strip_max_frames)
        self.extract_heatmaps = HeatmapHead(
            cfg.nkeypoints, act=("leakyrelu" if ci else "softplus"),
            dtype=self.dtype)
        if not cfg.fixed_sigma:
            self.sigma_param = self.param(
                "sigmas", normal(stddev=1.0), (cfg.nkeypoints,))
        if ci == 1:
            self.initial_heatmaps = self.param(
                "initial_heatmaps", normal(stddev=1.0),
                (self.heat_grid,) * 3 + (cfg.nkeypoints,))
        elif ci in (2, 3, 4):
            self.extract_st_features = feature_cls(
                self.feat_dim * 2, cfg.grid_size, dtype=self.dtype,
                remat_stages=cfg.remat >= 2, split_coords=True,
                use_strip=use_strip_enc,
                strip_max_frames=cfg.strip_max_frames)
            self.extract_st_heatmaps = HeatmapHead(
                cfg.nkeypoints, act="leakyrelu", dtype=self.dtype)
        if ci:
            # propagate_heatmaps: 1x1x1 conv (2 -> 1) + softplus
            # (kypt_detector.py:295-297); expressed as an explicit linear
            # combination so it can run inside lax.scan for modes 1/2.
            self.prop_w = self.param("propagate_kernel", PLAIN_CONV_INIT,
                                     (1, 1, 1, 2, 1))
            self.prop_b = self.param("propagate_bias", zeros_init(), (1,))

    def sigmas(self):
        cfg = self.cfg
        if cfg.fixed_sigma:
            return jnp.asarray([cfg.gaussian_sigma] * cfg.nkeypoints,
                               dtype=self.dtype)
        max_sigma = cfg.gaussian_sigma * 2.0
        return jax.nn.sigmoid(self.sigma_param) * max_sigma

    def _propagate(self, heatmap, prev):
        """softplus(w0*h + w1*prev + b); per-keypoint-independent fusion."""
        w = self.prop_w.reshape(2)
        return jax.nn.softplus(w[0] * heatmap + w[1] * prev + self.prop_b[0])

    def __call__(self, seq, Tcond: Optional[int] = None):
        """``seq``: (B, T, G, G, G, 1) -> (heatmaps, keypoints, gaussians,
        first_feature)."""
        cfg = self.cfg
        B, T = seq.shape[:2]
        ci = cfg.const_intensity

        # prior heatmap (B, g, g, g, K)
        prev_heatmap = None
        if ci == 1:
            prev_heatmap = jnp.broadcast_to(
                self.initial_heatmaps[None],
                (B,) + self.initial_heatmaps.shape)
        elif ci in (2, 3):
            seq_summed = jnp.mean(seq, axis=1)  # (B, G, G, G, 1)
            prev_heatmap = self.extract_st_heatmaps(
                self.extract_st_features(seq_summed))
        elif ci == 4:
            # motion saliency: dynamic voxels ~1, static ~1/T, masked to the
            # union of occupancy (reference kypt_detector.py:317-326; the
            # upstream Tcond branch is inverted/broken — we implement the
            # working full-sequence path).
            seq_summed = 1.0 - jnp.mean(seq, axis=1) + 1.0 / T
            seq_summed = seq_summed * jnp.clip(jnp.sum(seq, axis=1), 0, 1)
            prev_heatmap = self.extract_st_heatmaps(
                self.extract_st_features(seq_summed))

        # batched per-frame conv stack over folded (B*T); coord channels
        # enter inside the stem via the split-CoordConv decomposition.
        # Chunked over the folded axis so the frame count tiles the
        # 128-lane conv layouts exactly (see _apply_frame_chunked)
        features = _apply_frame_chunked(self.extract_features,
                                        _fold_time(seq),
                                        _resolve_frame_chunk(cfg))
        heatmaps = self.extract_heatmaps(features)  # (B*T, g, g, g, K)
        heatmaps = _unfold_time(heatmaps, B, T)
        first_feature = _unfold_time(features, B, T)[:, 0]

        if ci in (3, 4):
            heatmaps = self._propagate(heatmaps, prev_heatmap[:, None])
        elif ci in (1, 2):
            def step(prev, h_t):
                fused = self._propagate(h_t, prev)
                return fused, fused  # modes 1/2 update the prior recurrently

            _, fused = jax.lax.scan(step, prev_heatmap,
                                    jnp.moveaxis(heatmaps, 1, 0))
            heatmaps = jnp.moveaxis(fused, 0, 1)

        keypoints = extract_keypoints_from_heatmap(
            _fold_time(heatmaps))  # (B*T, K, 4)
        keypoints = _unfold_time(keypoints, B, T)
        gaussians = render_gaussian_maps(keypoints, self.sigmas(),
                                         self.heat_grid)
        return heatmaps, keypoints, gaussians, first_feature


# param-only modules shared with the strip encoder/decoder paths
from .blocks import _ConvParams, _GroupNormParams


def _strip_size(U: int, Cout: int) -> int:
    """Largest strip size with S*Cout <= 128 that divides U (the MXU lane
    tile is 128; S*Cout == 128 makes the conv output a full tile)."""
    S = max(128 // Cout, 1)
    while S > 1 and (U % S != 0 or 128 % Cout != 0):
        S //= 2
    return max(S, 1)


class VoxelDecoder(nn.Module):
    """Feature map at grid/4 -> occupancy logits at grid via 2x trilinear
    upsample + conv stages (reference build_voxel_decoder,
    kypt_detector.py:417-460).

    ``remat_stages``: checkpoint each conv stage individually.  The
    whole-decoder remat alone re-materialises EVERY stage's activations
    simultaneously in its backward (the measured peak driver at grid 64);
    nested per-stage remat bounds the backward peak to one stage's
    internals plus the stage boundaries.  Parameter names are pinned
    explicitly so the tree is identical either way.

    ``use_strip``: compute the k=3 convs strip-packed (ops/stripconv.py):
    S output planes fold into the channel dim so each conv becomes a
    full-MXU-tile contraction ((S+2)*Cin -> S*Cout = 128 lanes) instead
    of a lane-starved Cout=32/64 conv3d.  Pure XLA, same params, same
    math up to summation order.
    """
    feat_dim: int = 128
    dtype: jnp.dtype = jnp.float32
    remat_stages: bool = False
    use_strip: bool = True
    use_upconv: bool = False
    strip_max_frames: int = 0   # 0 = env NM_STRIP_MAX_FRAMES or 64

    @nn.compact
    def __call__(self, x):
        # half-pixel trilinear x2 (== torch Upsample align_corners=False),
        # as MXU contractions — jax.image.resize gathers are ~8x slower
        from ..ops.upsample import upsample2_trilinear as upsample2

        # Shape-dependent routing (static at trace time): with >= ~128
        # frames XLA solves lane starvation itself via batch-minor conv
        # layouts (batch rides the 128 lanes; measured 1.39 ms/frame at
        # 160 vs 2.42 at 40), so the strip form only wins below the
        # crossover — small batches, demos/serving, and the B=4..8
        # training microbatches (where its 1.36x backward also applies).
        import os
        max_frames = self.strip_max_frames or int(
            os.environ.get("NM_STRIP_MAX_FRAMES", "64"))
        if self.use_strip and x.shape[0] <= max_frames:
            return self._strip_forward(x, upsample2)

        def stage(mdl, v, C, i):
            v = Conv(C, (3, 3, 3), padding="SAME",
                     kernel_init=PLAIN_CONV_INIT, bias_init=zeros_init(),
                     dtype=mdl.dtype, name=f"Conv_{i}")(v)
            v = nn.GroupNorm(num_groups=max(C // 16, 1), epsilon=1e-5,
                             name=f"GroupNorm_{i}")(v)
            return leaky_relu(v)

        def upstage(mdl, v, Cin, C, i):
            # fused upsample2+conv as one coarse-grid conv (ops/upconv.py;
            # same params/names as the two-op stage, exact same math):
            # measured 1.73x (40 frames) / 1.85x (160) on hardware.  Only
            # the SECOND upsample stage routes here — the first
            # (128->64 @16^3) measured 0.94x fused (scripts/bench_upconv).
            from ..ops.upconv import (parity_unshuffle,
                                      upconv2_trilinear,
                                      upconv2_trilinear_packed)
            k, b = _ConvParams(C, (3, 3, 3), name=f"Conv_{i}")(Cin)
            # cast down BEFORE the fused op: the previous stage's
            # GroupNorm emits f32, and unlike the two-op path (where
            # Conv's promote_dtype downcasts at the conv input) nothing
            # else here pulls the convert up — without this the pixel
            # shuffle materialises 8 GB f32 temps at B=16 (measured
            # compile-time OOM, 17.6 G > 15.75 G HBM).
            import os
            if os.environ.get("NM_UPCONV_PACKED", "0") != "0":
                # boundary fixes on the COARSE packed tensor, ONE pixel
                # shuffle at the end.  Motivated by the r5 trace (the
                # fine-DUS chain's backward = 18 whole-64^3 pad_add
                # passes, ~117 ms/step at B=24) but MEASURED SLOWER
                # end-to-end: 16.01 vs 18.37 seqs/sec (B=24 accum=2
                # remat=0 bf16) — XLA fuses the fine-form chains into
                # consumers better than the packed+unshuffle graph.
                # Opt-in for re-measurement on future XLA versions.
                v = upconv2_trilinear_packed(v.astype(mdl.dtype),
                                             k.astype(mdl.dtype),
                                             b.astype(mdl.dtype))
                v = parity_unshuffle(v, 3)
            else:
                v = upconv2_trilinear(v.astype(mdl.dtype),
                                      k.astype(mdl.dtype),
                                      b.astype(mdl.dtype))
            v = nn.GroupNorm(num_groups=max(C // 16, 1), epsilon=1e-5,
                             name=f"GroupNorm_{i}")(v)
            return leaky_relu(v)

        if self.remat_stages:
            stage = nn.remat(stage, static_argnums=(2, 3))
            upstage = nn.remat(upstage, static_argnums=(2, 3, 4))

        x = upsample2(x)
        x = stage(self, x, self.feat_dim // 2, 0)
        x = stage(self, x, self.feat_dim // 2, 1)
        if self.use_upconv:
            x = upstage(self, x, self.feat_dim // 2, self.feat_dim // 4, 2)
        else:
            x = upsample2(x)
            x = stage(self, x, self.feat_dim // 4, 2)
        x = stage(self, x, self.feat_dim // 4, 3)
        return nn.Conv(1, (1, 1, 1), kernel_init=PLAIN_CONV_INIT,
                       bias_init=zeros_init(), dtype=self.dtype,
                       name="Conv_4")(x)

    def _strip_forward(self, x, upsample2):
        """Packed end-to-end: the input (N, g, g, g, F) is an S=1 packed
        tensor (F = full 128 lanes); upsampling doubles the strip size in
        place (upsample2_packed), so no pack/unpack transposes exist
        anywhere — the only relayout is the final (N, U, V, W, 1) output
        reshape.  GroupNorm is the reshape-free selector-matmul variant
        (splitting the 128-lane minor dim costs XLA relayout copies)."""
        del upsample2  # packed variant used instead
        from ..ops.stripconv import (strip_conv3_split,
                                     strip_group_norm_fast,
                                     upsample2_packed)

        def stage(mdl, v, Cin, C, i, S):
            k, b = _ConvParams(C, (3, 3, 3), name=f"Conv_{i}")(Cin)
            v = strip_conv3_split(v, k.astype(mdl.dtype),
                                  b.astype(mdl.dtype), S)
            sc, bi = _GroupNormParams(name=f"GroupNorm_{i}")(C)
            v = strip_group_norm_fast(v, sc, bi, max(C // 16, 1), S)
            return leaky_relu(v)

        if self.remat_stages:
            stage = nn.remat(stage, static_argnums=(2, 3, 4, 5))

        C01, C23 = self.feat_dim // 2, self.feat_dim // 4
        F = x.shape[-1]

        xp = upsample2_packed(x, 1)            # S=1 -> S=2 (@ 2g)
        S0 = 2
        xp = stage(self, xp, F, C01, 0, S0)
        xp = stage(self, xp, C01, C01, 1, S0)
        xp = upsample2_packed(xp, S0)          # S=2 -> S=4 (@ 4g)
        S2 = 2 * S0
        xp = stage(self, xp, C01, C23, 2, S2)
        xp = stage(self, xp, C23, C23, 3, S2)
        # 1x1 head as a lane-space block matmul (bandwidth-bound; the
        # (S, C) minor reshape would trigger a relayout copy)
        kh, bh = _ConvParams(1, (1, 1, 1), name="Conv_4")(C23)
        w_head = kh.astype(self.dtype)[0, 0, 0, :, 0]          # (C23,)
        blocks = [jnp.zeros((C23, S2), self.dtype)
                  .at[:, j].set(w_head) for j in range(S2)]
        Wblk = jnp.concatenate(blocks, axis=0)                  # (SC, S2)
        N, Us, V, W, _ = xp.shape
        logits = xp @ Wblk + bh.astype(self.dtype)  # (N, Us, V, W, S2)
        logits = jnp.moveaxis(logits, 4, 2)         # (N, Us, S2, V, W)
        return logits.reshape(N, Us * S2, V, W, 1)


class KyptToVoxNet(nn.Module):
    """Gaussian keypoint maps (+ first-frame feature) -> voxel occupancy.

    Reference `KyptToVoxNet` (kypt_detector.py:369-460), frame loop folded
    into the batch.  Output activation is the first-frame-biased sharpened
    sigmoid (kypt_detector.py:410).
    """
    cfg: MarionetteConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, gaussians, first_feature, first_frame,
                 sharpness: float = 10.0, translation: float = 0.5):
        """gaussians (B, T, g, g, g, K); first_feature (B, g, g, g, 128);
        first_frame (B, G, G, G, 1) -> (B, T, G, G, G, 1)."""
        cfg = self.cfg
        B, T = gaussians.shape[:2]
        K = gaussians.shape[-1]
        feat_dim = cfg.feat_dim

        if cfg.gaussian_cat_type == "max":
            pooled = jnp.max(gaussians, axis=-1, keepdims=True)
            gaussians = jnp.repeat(pooled, K, axis=-1)
        elif cfg.gaussian_cat_type == "sum":
            pooled = jnp.clip(jnp.sum(gaussians, axis=-1, keepdims=True),
                              0, 1)
            gaussians = jnp.repeat(pooled, K, axis=-1)

        g0 = jnp.broadcast_to(gaussians[:, :1], gaussians.shape)
        ff = jnp.broadcast_to(first_feature[:, None],
                              (B, T) + first_feature.shape[1:])
        combined = jnp.concatenate([gaussians, ff, g0], axis=-1)
        combined = add_coord_channels(_fold_time(combined))

        # adjust 1x1 conv (feat + 2K + D -> feat) + LeakyReLU
        # (kypt_detector.py:380-385)
        x = nn.Conv(feat_dim, (1, 1, 1), kernel_init=PLAIN_CONV_INIT,
                    bias_init=zeros_init(), dtype=self.dtype)(combined)
        x = leaky_relu(x)
        decoder_cls = nn.remat(VoxelDecoder) if cfg.remat else VoxelDecoder
        strip = cfg.strip_decoder
        use_strip = (jax.default_backend() == "tpu") if strip == -1 \
            else bool(strip)
        upconv = cfg.upconv_decoder
        use_upconv = (jax.default_backend() == "tpu") if upconv == -1 \
            else bool(upconv)
        decoder = decoder_cls(feat_dim, dtype=self.dtype,
                              remat_stages=cfg.remat >= 2,
                              use_strip=use_strip,
                              use_upconv=use_upconv,
                              strip_max_frames=cfg.strip_max_frames)
        logits = _apply_frame_chunked(decoder, x,
                                      _resolve_frame_chunk(cfg))

        ff0 = jnp.broadcast_to(first_frame[:, None],
                               (B, T) + first_frame.shape[1:])
        logits = _unfold_time(logits, B, T)
        return jax.nn.sigmoid(
            sharpness * (jnp.tanh(logits) + ff0 - translation))


class KyptDetector(nn.Module):
    """Encoder + decoder + learned affinity graph + detector losses.

    Reference `KyptDetector` (kypt_detector.py:10-241).  The
    ``affinity_start`` annealing gate (kypt_detector.py:71-78) becomes the
    static ``affinity_active`` call argument, driven by the training
    scheduler.
    """
    cfg: MarionetteConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.vox_to_kypt = VoxToKyptNet(cfg, dtype=self.dtype)
        self.kypt_to_vox = KyptToVoxNet(cfg, dtype=self.dtype)
        if cfg.keypoints_graph == "affinity_params":
            K, n = cfg.nkeypoints, cfg.nneighbor
            cols = K if cfg.affinity_ver < 3 else K - 1
            if cfg.graph_random_init:
                init = normal(stddev=1.0)
            elif cfg.affinity_ver < 3:
                init = zeros_init()
            else:
                init = nn.initializers.ones_init()
            self.affinity_params = self.param("affinity_params", init,
                                              (n, K, cols))

    # ------------------------------------------------------------- affinity
    def get_affinity(self) -> jnp.ndarray:
        """(nneighbor, K, K, 1) affinity; 5 versions
        (kypt_detector.py:171-211).  Shipped config is ver 3."""
        cfg = self.cfg
        ver = cfg.affinity_ver
        K = cfg.nkeypoints
        P = self.affinity_params
        if ver == 0:
            W = jax.nn.softmax(P, axis=2)
        elif ver == 1:
            W = jax.nn.softplus(P)
            W = jnp.einsum("nij,nkj->nik", W, W)
            W = W * (1.0 - jnp.eye(K))[None]
            W = W / (jnp.sum(W, axis=-1, keepdims=True) + 1e-6)
        elif ver == 2:
            W = jax.nn.softplus(P)
            W = W * (1.0 - jnp.eye(K))[None]
            W = jax.nn.softmax(W, axis=2)
        elif ver in (3, 4):
            if ver == 3:
                Wt = jax.nn.softmax(P, axis=-1)  # (n, K, K-1)
            else:
                g = -jnp.log(-jnp.log(
                    jax.random.uniform(self.make_rng("gumbel"), P.shape,
                                       minval=1e-20, maxval=1.0) + 1e-20))
                Wt = jax.nn.softmax(P + g, axis=-1)
            zeros_col = jnp.zeros((Wt.shape[0], K, 1), dtype=Wt.dtype)
            m_up = jnp.concatenate(
                [zeros_col, jnp.triu(Wt, k=0)], axis=-1)
            m_low = jnp.concatenate(
                [jnp.tril(Wt, k=-1), zeros_col], axis=-1)
            W = m_up + m_low
        else:
            raise ValueError("Invalid affinity version")
        return W[..., None]

    # -------------------------------------------------------------- forward
    def __call__(self, seq, affinity_active: bool = True,
                 Tcond: Optional[int] = None) -> dict[str, Any]:
        cfg = self.cfg
        B, T = seq.shape[:2]
        heatmaps, keypoints, gaussians, first_feature = \
            self.vox_to_kypt(seq, Tcond=Tcond)
        recon = self.kypt_to_vox(gaussians, first_feature, seq[:, 0])

        recon_loss = L.bce_recon_loss(recon, seq)
        kypt_const_loss = jnp.zeros((B, T), seq.dtype)  # dead upstream
        sparsity_loss = L.keypoint_sparsity_loss(heatmaps)
        separation_loss = L.temporal_separation_loss(keypoints, cfg.sep_sigma)
        sigmas = self.vox_to_kypt.sigmas()
        vol_fit_reg = L.volume_fitting_loss(seq, keypoints, sigmas,
                                            cfg.vol_fit_type)

        zero_bt = jnp.zeros((B, T), seq.dtype)
        if cfg.keypoints_graph == "none" or not affinity_active:
            affinity = None
            local = time_c = sparsity_c = intensity_c = zero_bt
            graph_traj = zero_bt
        else:
            affinity = self.get_affinity()
            kp = jax.lax.stop_gradient(keypoints) if cfg.keypoints_detach \
                else keypoints
            local, time_c, sparsity_c, intensity_c = \
                L.graph_consistency_losses(
                    kp, affinity,
                    local_const=bool(cfg.using_local_const),
                    time_const=bool(cfg.using_time_const),
                    sparsity_const=bool(cfg.using_sparsity_const),
                    ver=cfg.graph_loss_ver)
            if cfg.graph_traj_weight > 0:
                graph_traj = L.graph_trajectory_loss(kp, affinity,
                                                     ver=cfg.graph_loss_ver)
            else:
                graph_traj = zero_bt
        graph_vol = zero_bt  # always zeros upstream (kypt_detector.py:117)

        return dict(
            recon=recon,
            keypoints=keypoints,
            heatmaps=heatmaps,
            affinity=affinity,
            recon_loss=jnp.mean(recon_loss),
            vol_fit_reg=jnp.mean(vol_fit_reg),
            kypt_const_loss=jnp.mean(kypt_const_loss),
            separation_loss=jnp.mean(separation_loss),
            sparsity_loss=jnp.mean(sparsity_loss),
            local_const_loss=jnp.mean(local),
            time_const_loss=jnp.mean(time_c),
            sparsity_const_loss=jnp.mean(sparsity_c),
            intensity_const_loss=jnp.mean(intensity_c),
            graph_traj_loss=jnp.mean(graph_traj),
            graph_vol_loss=jnp.mean(graph_vol),
            first_feature=first_feature,
        )

    def decode_from_dyna(self, keypoints, first_feature, first_frame):
        """Generated keypoints -> voxels (kypt_detector.py:213-241).

        Uses the fixed sigma list (as upstream, even when sigmas are
        learned)."""
        cfg = self.cfg
        sigmas = jnp.asarray([cfg.gaussian_sigma] * cfg.nkeypoints,
                             dtype=keypoints.dtype)
        gaussians = render_gaussian_maps(keypoints, sigmas,
                                         cfg.grid_size // 4)
        gen = self.kypt_to_vox(gaussians, first_feature, first_frame)
        return dict(gen=gen)
