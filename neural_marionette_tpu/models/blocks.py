"""3D conv building blocks (flax.linen), TPU-native.

Functional re-design of reference `modules/vox_modules.py` (torch
nn.Modules).  Differences by design:

* channels-LAST layout ``(B, X, Y, Z, C)`` — flax/XLA native on TPU;
* weight init is baked into the module definitions instead of a post-hoc
  ``weights_init`` visitor (reference utils/train_utils.py:248-263): convs
  inside *Block modules get N(0, 0.001), standalone convs N(0, 0.02),
  all biases zero — exactly the distribution the reference's
  ``network.apply(weights_init)`` produces for pretrained_mode=0;
* every norm layer is GroupNorm(C // 16) with eps 1e-5, as upstream
  (all BatchNorms in the reference are commented out).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax.linen.initializers import normal, zeros_init

# reference weights_init: Conv* inside *Block modules -> N(0, 0.001);
# other convs -> N(0, 0.02)  (utils/train_utils.py:248-263)
BLOCK_CONV_INIT = normal(stddev=0.001)
PLAIN_CONV_INIT = normal(stddev=0.02)

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def _env_flag(name: str) -> bool:
    import os
    return os.environ.get(name, "0") != "0"


def group_norm(C: int):
    return nn.GroupNorm(num_groups=max(C // 16, 1), epsilon=1e-5)


class _ConvParams(nn.Module):
    """Owns a conv's kernel/bias WITHOUT computing the conv (used by paths
    that compute the conv themselves: the strip decoder, the coord-split
    stem).  Same param names/shapes/init as nn.Conv, and instantiated
    under the same pinned name, so the parameter tree and checkpoints are
    identical across paths."""
    features: int
    kernel_size: tuple
    kernel_init: Callable = None  # default set in __call__ (dataclass rule)

    @nn.compact
    def __call__(self, in_features: int):
        init = self.kernel_init or PLAIN_CONV_INIT
        k = self.param("kernel", init,
                       tuple(self.kernel_size) + (in_features,
                                                  self.features))
        b = self.param("bias", zeros_init(), (self.features,))
        return k, b


class _GroupNormParams(nn.Module):
    """scale/bias of nn.GroupNorm, under the same pinned name."""
    @nn.compact
    def __call__(self, C: int):
        scale = self.param("scale", nn.initializers.ones_init(), (C,))
        bias = self.param("bias", zeros_init(), (C,))
        return scale, bias


class Basic3DBlock(nn.Module):
    """Conv3d(k, same) -> GroupNorm(C/16) -> LeakyReLU.

    Reference modules/vox_modules.py:8-19.

    ``split_coords``: the caller passes ``x`` WITHOUT the trailing D
    coordinate channels of ``add_coord_channels`` (reference
    utils/kypt_detector_utils.py:4-26); the conv kernel still has Cin+D
    input channels (identical param tree / checkpoints).  In the plain
    path the block simply appends the coords itself (identical graph to
    concat-at-the-caller; a decomposed conv(vox)+conv(coords) form
    measured SLOWER on hardware — 19.5 vs 9.6 ms at 40 frames — because a
    Cin=1 conv3d is even more lane-starved than Cin=4,
    scripts/bench_encoder_parts.py).

    ``strip``: strip-packed input/output (ops/stripconv): ``x`` is
    ``pack_strips(vox, S)`` WITHOUT coord channels (requires
    ``split_coords``); the conv runs as the full-lane
    ``strip_convk_split`` on the occupancy plus a ONE-frame coordinate
    field (the CoordConv decomposition pays off here: measured
    fwd 9.6 -> 5.5 ms, weight-grad 17.9 -> 2.7 ms at 40 frames), and
    GroupNorm runs packed (``strip_group_norm_fast``).
    """
    out_channels: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32
    split_coords: bool = False
    strip: int = 0

    @nn.compact
    def __call__(self, x):
        C = self.out_channels
        if self.strip:
            assert self.split_coords, "strip stem requires split_coords"
            from ..ops.stripconv import strip_group_norm_fast
            x = self._strip_coord_conv(x)
            sc, bi = _GroupNormParams(name="GroupNorm_0")(C)
            return leaky_relu(strip_group_norm_fast(
                x, sc, bi, max(C // 16, 1), self.strip))
        if self.split_coords:
            if _env_flag("NM_STEM_SPLIT_PLAIN"):
                # one-frame constant-field CoordConv decomposition on the
                # PLAIN path (the strip path's blocks.py _strip_coord_conv
                # trick, ported): numerically exact (grad rel ~1e-7) and
                # kills 3/4 of the stem conv FLOPs — but MEASURED SLOWER
                # end-to-end at the flagship training point (17.69 vs
                # 18.37 seqs/sec, B=24 accum=2 remat=0 bf16, r5): XLA's
                # batch-minor Cin=4 conv beats the Cin=1 + constant-field
                # pair.  Kept opt-in for re-measurement.
                return self._plain_split_stem(x)
            from ..ops.coords import add_coord_channels
            x = add_coord_channels(x)
        x = Conv(C, (self.kernel_size,) * 3,
                 padding="SAME", kernel_init=BLOCK_CONV_INIT,
                 bias_init=zeros_init(), dtype=self.dtype)(x)
        x = group_norm(C)(x)
        return leaky_relu(x)

    def _plain_split_stem(self, x):
        from flax.linen.dtypes import promote_dtype
        from ..ops.coords import coord_maps
        C = self.out_channels
        ks = (self.kernel_size,) * 3
        Cin = x.shape[-1]
        k, b = _ConvParams(C, ks, kernel_init=BLOCK_CONV_INIT,
                           name="Conv_0")(Cin + 3)
        x, k, b = promote_dtype(x, k, b, dtype=self.dtype)
        out = jax.lax.conv_general_dilated(
            x, k[..., :Cin, :], (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        coords = coord_maps(x.shape[1:4], x.dtype)[None]  # (1, D, V, W, 3)
        field = jax.lax.conv_general_dilated(
            jax.lax.stop_gradient(coords), k[..., Cin:, :], (1, 1, 1),
            "SAME", dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        x = out + field + b
        x = group_norm(C)(x)
        return leaky_relu(x)

    def _strip_coord_conv(self, xp):
        from flax.linen.dtypes import promote_dtype
        from ..ops.coords import coord_maps
        from ..ops.stripconv import pack_strips, strip_convk_split

        S = self.strip
        N, Us, V, W, SC = xp.shape
        Cin = SC // S
        ks = (self.kernel_size,) * 3
        k, b = _ConvParams(self.out_channels, ks,
                           kernel_init=BLOCK_CONV_INIT, name="Conv_0")(
                               Cin + 3)
        xp, k, b = promote_dtype(xp, k, b, dtype=self.dtype)
        out = strip_convk_split(xp, k[..., :Cin, :], None, S)
        coords = coord_maps((Us * S, V, W), xp.dtype)[None]  # (1,*S,3)
        field = strip_convk_split(pack_strips(coords, S),
                                  k[..., Cin:, :], None, S)
        return out + field + jnp.tile(b, S)


class Res3DBlock(nn.Module):
    """2x(Conv3 + GN) residual with 1x1 skip projection; LeakyReLU on the sum.

    Reference modules/vox_modules.py:22-47.
    """
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        res = Conv(self.out_channels, (3, 3, 3), padding="SAME",
                      kernel_init=BLOCK_CONV_INIT, bias_init=zeros_init(),
                      dtype=self.dtype)(x)
        res = group_norm(self.out_channels)(res)
        res = leaky_relu(res)
        res = Conv(self.out_channels, (3, 3, 3), padding="SAME",
                      kernel_init=BLOCK_CONV_INIT, bias_init=zeros_init(),
                      dtype=self.dtype)(res)
        res = group_norm(self.out_channels)(res)

        if in_channels == self.out_channels:
            skip = x
        else:
            skip = nn.Conv(self.out_channels, (1, 1, 1),
                           kernel_init=BLOCK_CONV_INIT,
                           bias_init=zeros_init(), dtype=self.dtype)(x)
            skip = group_norm(self.out_channels)(skip)
        # NOTE upstream quirk replicated: the reference calls
        # F.leaky_relu(res + skip, True) (vox_modules.py:47) where True is
        # positionally negative_slope=1.0 — i.e. the output "activation" is
        # the identity.  Published checkpoints were trained this way.
        return res + skip


class Pool3DBlock(nn.Module):
    """Strided-conv downsample (kernel=stride=pool) + GN + LeakyReLU.

    Reference modules/vox_modules.py:49-61 (not actual pooling).

    ``strip``: strip-packed input/output (ops/stripconv.strip_pool2 +
    strip_group_norm_fast) — measured 4.5 -> 2.2 ms at 40 frames 64^3
    C=32 (scripts/bench_encoder_parts.py).  Only pool_size=2 supported.
    """
    pool_size: int
    dtype: jnp.dtype = jnp.float32
    strip: int = 0

    @nn.compact
    def __call__(self, x):
        p = self.pool_size
        if self.strip:
            assert p == 2, "strip pool supports pool_size=2"
            from flax.linen.dtypes import promote_dtype
            from ..ops.stripconv import strip_pool2, strip_group_norm_fast
            S = self.strip
            C = x.shape[-1] // S
            k, b = _ConvParams(C, (p, p, p),
                               kernel_init=BLOCK_CONV_INIT,
                               name="Conv_0")(C)
            x, k, b = promote_dtype(x, k, b, dtype=self.dtype)
            x = strip_pool2(x, k, b, S)
            sc, bi = _GroupNormParams(name="GroupNorm_0")(C)
            return leaky_relu(strip_group_norm_fast(
                x, sc, bi, max(C // 16, 1), S))
        C = x.shape[-1]
        x = nn.Conv(C, (p, p, p), strides=(p, p, p), padding="VALID",
                    kernel_init=BLOCK_CONV_INIT, bias_init=zeros_init(),
                    dtype=self.dtype)(x)
        x = group_norm(C)(x)
        return leaky_relu(x)


class Upsample3DBlock(nn.Module):
    """ConvTranspose3d(k=2, s=2) + GN + LeakyReLU, with torch-style
    ``output_padding`` (extra high-side plane; with k=s=2 the extra outputs
    receive bias only).

    Reference modules/vox_modules.py:63-75.
    """
    out_channels: int
    output_padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.out_channels, (2, 2, 2), strides=(2, 2, 2),
                             padding="VALID", use_bias=False,
                             kernel_init=BLOCK_CONV_INIT,
                             dtype=self.dtype)(x)
        if self.output_padding:
            pad = [(0, 0)] + [(0, self.output_padding)] * 3 + [(0, 0)]
            x = jnp.pad(x, pad)
        bias = self.param("bias", zeros_init(), (self.out_channels,))
        x = x + bias
        x = group_norm(self.out_channels)(x)
        return leaky_relu(x)


class Hourglass(nn.Module):
    """3-level 3D hourglass with residual skip paths.

    Reference modules/vox_modules.py:78-120 (``HG``; structure credited
    upstream to AnimSkelVolNet).  ``N`` is the input spatial size, used only
    to derive decoder output_padding for non-power-of-two grids.
    """
    output_channels: int
    N: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        N = self.N
        outer_padding = [(N // 4) % 2, (N // 2) % 2, N % 2]
        dt = self.dtype

        skip1 = Res3DBlock(self.output_channels, dtype=dt)(x)
        x = Pool3DBlock(2, dtype=dt)(x)
        x = Res3DBlock(32, dtype=dt)(x)
        skip2 = Res3DBlock(32, dtype=dt)(x)
        x = Pool3DBlock(2, dtype=dt)(x)
        x = Res3DBlock(48, dtype=dt)(x)
        skip3 = Res3DBlock(48, dtype=dt)(x)
        x = Pool3DBlock(2, dtype=dt)(x)
        x = Res3DBlock(72, dtype=dt)(x)

        x = Res3DBlock(72, dtype=dt)(x)
        x = Upsample3DBlock(48, outer_padding[0], dtype=dt)(x)
        x = x + skip3
        x = Res3DBlock(48, dtype=dt)(x)
        x = Upsample3DBlock(32, outer_padding[1], dtype=dt)(x)
        x = x + skip2
        x = Res3DBlock(32, dtype=dt)(x)
        x = Upsample3DBlock(self.output_channels, outer_padding[2],
                            dtype=dt)(x)
        return x + skip1


def _pallas_conv_applicable(mod: "Conv", x) -> bool:
    """Route through the tap-packed Pallas kernel: odd cubic stride-1
    SAME convs, bf16 compute, real TPU backend.

    OPT-IN (NM_PALLAS_CONV=1): measured on hardware (ROADMAP.md), the
    kernel reaches 20.7 TF/s on the 64^3 64->32 decoder conv — 1.5x the
    standalone XLA conv but still behind XLA's in-graph fusion (39.6 ms
    there includes the GN stats and a layout XLA chose globally).  The
    identified path to a real win is a fused decoder megakernel that
    keeps activations in VMEM across conv+GN+LReLU stages; until then
    the default stays XLA."""
    import os
    import jax
    if os.environ.get("NM_PALLAS_CONV") != "1":
        return False
    k = mod.kernel_size
    strides = mod.strides or 1
    return (x.ndim == 5
            and len(k) == 3 and len(set(k)) == 1 and k[0] % 2 == 1
            and k[0] >= 3
            and x.shape[-1] >= 32  # HBM/VMEM tile-pads channels to 128
            # lanes: small-Cin convs (the k5 stem, Cin=4) blow the
            # budget 32x and stay on XLA
            and strides in (1, (1, 1, 1))
            and mod.padding == "SAME"
            and mod.feature_group_count == 1
            and mod.use_bias
            and mod.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu")


def _hybrid_wgrad_strip(mod: "Conv", x) -> int:
    """Backward strip size for the hybrid-gradient conv route
    (ops/hybridconv: plain forward, strip-packed weight-gradient), or 0.

    Applies to odd cubic stride-1 SAME convs with lane-starved Cout on
    the TPU backend (the plain wgrad's matmul pads Cout to 128 output
    lanes — structural 128/Cout tile waste no frame count fixes).  The
    forward HLO is unchanged, so inference and parity tests see the
    identical plain conv.

    OFF by default: measured end-to-end (B=24 accum=2, 120-frame
    chunks, r4) the hybrid wgrad LOST — 12.97 vs 16.02 seqs/sec —
    because XLA's fused plain backward beats the strip repack once the
    frame-chunked layouts are in place.  Kept as an opt-in
    (NM_HYBRID_WGRAD=1) for lane-starved shapes outside the default
    training config."""
    import os
    import jax
    force = os.environ.get("NM_HYBRID_WGRAD_FORCE") == "1"  # CPU tests
    if not force and os.environ.get("NM_HYBRID_WGRAD", "0") != "1":
        return 0
    k = mod.kernel_size
    strides = mod.strides or 1
    if not (x.ndim == 5
            and len(k) == 3 and len(set(k)) == 1 and k[0] % 2 == 1
            and k[0] >= 3
            and strides in (1, (1, 1, 1))
            and mod.padding == "SAME"
            and mod.feature_group_count == 1
            and mod.use_bias
            and (force or jax.default_backend() == "tpu")):
        return 0
    from ..ops.hybridconv import hybrid_strip_size
    return hybrid_strip_size(mod.features, x.shape[1], k[0])


class Conv(nn.Conv):
    """Drop-in nn.Conv (same class name, so flax auto-naming and therefore
    the parameter tree / checkpoints are unchanged) that on the TPU path
    routes odd cubic stride-1 convs through (a) the hybrid-gradient conv
    (plain forward HLO, strip-packed weight-gradient — ops/hybridconv) for
    lane-starved Cout, or (b) the tap-packed Pallas kernel
    (ops/pallas/conv3d_kernel, opt-in NM_PALLAS_CONV=1), and defers to
    XLA's conv everywhere else (1x1 heads, fp32 parity tests, CPU)."""

    @nn.compact
    def __call__(self, x):
        use_pallas = _pallas_conv_applicable(self, x)
        hybrid_S = 0 if use_pallas else _hybrid_wgrad_strip(self, x)
        if not (use_pallas or hybrid_S):
            return super().__call__(x)
        kernel = self.param(
            "kernel", self.kernel_init,
            tuple(self.kernel_size) + (x.shape[-1], self.features),
            self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        from flax.linen.dtypes import promote_dtype
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        if hybrid_S:
            from ..ops.hybridconv import conv3d_hybrid
            return conv3d_hybrid(x, kernel, bias, hybrid_S)
        from ..ops.pallas.conv3d_kernel import conv3d_pallas
        return conv3d_pallas(x, kernel, bias)
