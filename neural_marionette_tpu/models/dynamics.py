"""HSVRNNBVH: variational-RNN latent dynamics over keypoints with
forward-kinematic 6D-rotation decoding.

TPU-native re-design of reference `model/hsvrnn_bvh.py`:

* the Python ``for t in range(T)`` rollouts (hsvrnn_bvh.py:89, :171, :208)
  become ``jax.lax.scan`` with the GRU state as carry;
* the best-of-N sampling loop (hsvrnn_bvh.py:110-123) is vectorised: the
  N samples become a leading axis folded into the batch for the decoders
  and FK, selected with a batched argmin;
* the FK dict walk is the scans in ``ops.fk``.

The tiny decoder MLPs and the GRU cell are explicit parameters (not nested
flax modules) so every step stays a plain traced function — no lifted
transforms.  Initialisations replicate torch defaults (the reference's
``weights_init`` never touches Linear/GRUCell layers): uniform
(-1/sqrt(fan_in), +1/sqrt(fan_in)) for Linear, uniform(+-1/sqrt(hidden))
for the GRU.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax.linen.initializers import normal

from ..config import MarionetteConfig
from ..ops.fk import fk_global_rotations_parallel, fk_positions_parallel
from ..ops.losses import gaussian_kl
from ..ops.rotations import rotation_6d_to_matrix


def _torch_linear_init(fan_in):
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class SkeletonArrays(NamedTuple):
    """Device-array form of :class:`neural_marionette_tpu.skeleton.Skeleton`,
    as consumed by the jitted FK scans."""
    priority_indices: jnp.ndarray  # (K,) int32, root first
    parents: jnp.ndarray           # (K,) int32

    @classmethod
    def from_skeleton(cls, sk):
        return cls(priority_indices=jnp.asarray(sk.priority_indices),
                   parents=jnp.asarray(sk.parents))

    @classmethod
    def chain(cls, K: int):
        """Trivial 0-1-2-... chain; placeholder before affinity training
        produces a real skeleton."""
        import numpy as np
        parents = np.maximum(np.arange(K) - 1, 0).astype(np.int32)
        return cls(priority_indices=jnp.arange(K, dtype=jnp.int32),
                   parents=jnp.asarray(parents))


class HSVRNNBVH(nn.Module):
    """Prior/posterior GRU over keypoint states (reference hsvrnn_bvh.py)."""
    cfg: MarionetteConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        K = cfg.nkeypoints
        Z = cfg.nlatent_kypt
        H = cfg.nhidden_kypt
        S = K * (cfg.input_dim + 1)  # state dim (hsvrnn_bvh.py:22)
        self._S, self._Z, self._H, self._K = S, Z, H, K

        def dense(name, fin, fout):
            w = self.param(f"{name}_w", _torch_linear_init(fin), (fin, fout))
            b = self.param(f"{name}_b", _torch_linear_init(fin), (fout,))
            return w, b

        # posterior / prior nets (hsvrnn_bvh.py:29-40)
        self.post_l1 = dense("post_l1", H + S, 128)
        self.post_l2 = dense("post_l2", 128, 2 * Z)
        self.prior_l1 = dense("prior_l1", H, 128)
        self.prior_l2 = dense("prior_l2", 128, 2 * Z)
        # root position + per-joint intensity decoder (hsvrnn_bvh.py:41-47)
        self.root_l1 = dense("root_l1", H + Z, 128)
        self.root_l2 = dense("root_l2", 128, 3 + K)
        # 6D joint rotation decoder (hsvrnn_bvh.py:49-54)
        self.joint_l1 = dense("joint_l1", H + Z, 128)
        self.joint_l2 = dense("joint_l2", 128, 6 * K)
        # GRU cell (hsvrnn_bvh.py:57-58); torch GRUCell init: U(+-1/sqrt(H))
        gru_init = _torch_linear_init(H)
        self.gru_w_ih = self.param("gru_w_ih", gru_init, (S + Z, 3 * H))
        self.gru_w_hh = self.param("gru_w_hh", gru_init, (H, 3 * H))
        self.gru_b_ih = self.param("gru_b_ih", gru_init, (3 * H,))
        self.gru_b_hh = self.param("gru_b_hh", gru_init, (3 * H,))
        # learned initial state + frozen offset directions (hsvrnn_bvh.py:60-65)
        self.init_state = self.param("init_kypt_rnn_state",
                                     normal(stddev=1.0), (1, H))
        self.offset_param = self.param("offset_param", normal(stddev=1.0),
                                       (K, 3))

    # ------------------------------------------------------------ primitives
    @staticmethod
    def _mlp(x, l1, l2):
        h = x @ l1[0] + l1[1]
        h = nn.leaky_relu(h, negative_slope=0.01)
        return h @ l2[0] + l2[1]

    def _gru(self, x, h):
        """torch.nn.GRUCell semantics (reset gate inside the candidate)."""
        gi = x @ self.gru_w_ih + self.gru_b_ih
        gh = h @ self.gru_w_hh + self.gru_b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h

    def _dist_params(self, x, l1, l2):
        raw = self._mlp(x, l1, l2)
        mean, std_raw = jnp.split(raw, 2, axis=-1)
        std = jax.nn.softplus(std_raw) + 1e-4  # hsvrnn_bvh.py:95,103
        return mean, std

    def _post_prior_fused(self, h, keypoint_flat):
        """Posterior(h, x) and prior(h) as ONE two-layer MLP on [h, x]:
        the prior's layer-1 weight gets zero rows for the x block and
        layer 2 is block-diagonal, so every output column's dot product
        keeps exactly the separate matmuls' terms (plus zeros).  Same
        dispatch-halving rationale as :meth:`_decoder_fused` — these run
        once per VRNN scan step.

        Returns (post_mean, post_std, prior_mean, prior_std)."""
        S = keypoint_flat.shape[-1]
        n = self.post_l1[0].shape[1]
        w1q = jnp.concatenate(
            [self.prior_l1[0],
             jnp.zeros((S, n), dtype=self.prior_l1[0].dtype)], axis=0)
        w1 = jnp.concatenate([self.post_l1[0], w1q], axis=1)
        b1 = jnp.concatenate([self.post_l1[1], self.prior_l1[1]])
        x = jnp.concatenate([h, keypoint_flat], axis=-1)
        hid = nn.leaky_relu(x @ w1 + b1, negative_slope=0.01)
        d = self.post_l2[0].shape[1]                       # 2*Z
        w2 = jnp.zeros((2 * n, 2 * d), dtype=self.post_l2[0].dtype)
        w2 = w2.at[:n, :d].set(self.post_l2[0])
        w2 = w2.at[n:, d:].set(self.prior_l2[0])
        b2 = jnp.concatenate([self.post_l2[1], self.prior_l2[1]])
        out = hid @ w2 + b2
        post_mean, post_sraw = jnp.split(out[:, :d], 2, axis=-1)
        prior_mean, prior_sraw = jnp.split(out[:, d:], 2, axis=-1)
        eps = 1e-4  # hsvrnn_bvh.py:95,103
        return (post_mean, jax.nn.softplus(post_sraw) + eps,
                prior_mean, jax.nn.softplus(prior_sraw) + eps)

    def _decoder_fused(self, x):
        """Both decoder heads (root+intensity, joint 6D) read the SAME
        input, so run them as ONE two-layer MLP: layer 1 on concatenated
        weights, layer 2 block-diagonal (the off-blocks are zeros, so
        every output column's dot product is term-for-term the separate
        matmul's).  Halves the per-step dispatches inside the VRNN scans,
        where the (B, 128) matmuls are pure chain latency.  The weight
        assembly is scan-invariant and hoisted by XLA.

        Returns (root raw pre-tanh (B, 3+K), rot6d flat (B, 6*K))."""
        w1 = jnp.concatenate([self.root_l1[0], self.joint_l1[0]], axis=1)
        b1 = jnp.concatenate([self.root_l1[1], self.joint_l1[1]])
        h = nn.leaky_relu(x @ w1 + b1, negative_slope=0.01)
        n_r = self.root_l2[0].shape[0]
        d_r = self.root_l2[0].shape[1]
        d_j = self.joint_l2[0].shape[1]
        w2 = jnp.zeros((w1.shape[1], d_r + d_j), dtype=self.root_l2[0].dtype)
        w2 = w2.at[:n_r, :d_r].set(self.root_l2[0])
        w2 = w2.at[n_r:, d_r:].set(self.joint_l2[0])
        b2 = jnp.concatenate([self.root_l2[1], self.joint_l2[1]])
        out = h @ w2 + b2
        return out[:, :d_r], out[:, d_r:]

    # -------------------------------------------------------------- decoding
    def extract_kypt_from_latent_and_state(self, decoder_input, offset,
                                           skeleton: SkeletonArrays):
        """(B, H+Z), (B, K, 3) -> (flat keypoints (B, K*(D+1)), R (B, K, 3, 3)).

        Reference hsvrnn_bvh.py:255-286: decode root position + intensities
        (tanh -> [0, 1]) and 6D rotations; compose global rotations; walk the
        tree for positions.
        """
        K = self._K
        root_raw, rot6d = self._decoder_fused(decoder_input)
        raw = jnp.tanh(root_raw)
        root_pos = raw[:, :3]
        intensity = (raw[:, 3:] + 1.0) * 0.5  # (B, K)
        rot6d = rot6d.reshape(-1, K, 6)
        R_local = rotation_6d_to_matrix(rot6d)
        # log-depth pointer-doubling FK: 5 batched rounds instead of K=24
        # sequential scan steps per frame (this runs inside the VRNN time
        # scan, so chain latency is the cost that matters)
        R_glob = fk_global_rotations_parallel(
            R_local, skeleton.priority_indices, skeleton.parents)
        pos = fk_positions_parallel(
            R_glob, offset, root_pos,
            skeleton.priority_indices, skeleton.parents)
        processed = jnp.concatenate([pos, intensity[..., None]], axis=-1)
        return processed.reshape(processed.shape[0], -1), R_glob

    # ----------------------------------------------------- demo rollouts
    def generate_many(self, keypoints_cond, skeleton: SkeletonArrays,
                      Ttot: int, Tcond: int, sample_num: int = 3):
        """Conditioned collapse then ``sample_num`` INDEPENDENT prior
        rollouts (the vis_generation demo loop, reference
        vis_generation.py:92-127): per conditioning step draw sample_num
        posterior samples, collapse everything to the best one; then fan the
        state out and roll each sample forward independently.

        Returns (cond_keypoints (1, Tcond, K, 4),
                 gen_keypoints (sample_num, Ttot-Tcond, K, 4)).
        """
        B, _, K, _ = keypoints_cond.shape
        assert B == 1, "demo path is single-clip"
        offset = self.get_offset(keypoints_cond, skeleton.parents)
        offset_rep = jnp.tile(offset, (sample_num, 1, 1))
        h = jnp.broadcast_to(self.init_state, (1, self._H))
        rng = self.make_rng("sample")
        cond_keys = jax.random.split(jax.random.fold_in(rng, 0), Tcond)

        def cond_step(h, inp):
            key, keypoint = inp
            keypoint_flat = keypoint.reshape(1, -1)
            post_mean, post_std = self._dist_params(
                jnp.concatenate([h, keypoint_flat], axis=-1),
                self.post_l1, self.post_l2)
            eps = jax.random.normal(key, (sample_num, 1, self._Z),
                                    dtype=post_mean.dtype)
            z_samples = post_mean[None] + post_std[None] * eps
            best_z, best_kypt, _ = self._best_of_n(
                h, z_samples, offset_rep, skeleton, keypoint_flat)
            h_new = self._gru(
                jnp.concatenate([best_kypt, best_z], axis=-1), h)
            return h_new, keypoint_flat[0]

        h, cond_kypts = jax.lax.scan(
            cond_step, h, (cond_keys, jnp.moveaxis(keypoints_cond, 1, 0)))
        cond_keypoints = cond_kypts.reshape(1, Tcond, K, -1)

        # fan out: sample_num independent prior rollouts
        h_many = jnp.broadcast_to(h, (sample_num, self._H))
        gen_keys = jax.random.split(jax.random.fold_in(rng, 1), Ttot - Tcond)

        def gen_step(h, key):
            prior_mean, prior_std = self._dist_params(
                h, self.prior_l1, self.prior_l2)
            eps = jax.random.normal(key, prior_mean.shape,
                                    dtype=prior_mean.dtype)
            z = prior_mean + prior_std * eps
            kypt_flat, _ = self.extract_kypt_from_latent_and_state(
                jnp.concatenate([h, z], axis=-1), offset_rep, skeleton)
            h_new = self._gru(jnp.concatenate([kypt_flat, z], axis=-1), h)
            return h_new, kypt_flat

        _, gen_kypts = jax.lax.scan(gen_step, h_many, gen_keys)
        gen_keypoints = jnp.moveaxis(gen_kypts, 0, 1).reshape(
            sample_num, Ttot - Tcond, K, -1)
        return cond_keypoints, gen_keypoints

    def interpolate(self, keypoints, skeleton: SkeletonArrays,
                    anchor_rate: int = 10, sample_num: int = 10000):
        """Anchor-constrained latent in-betweening (the vis_interpolation
        demo, reference vis_interpolation.py:91-136): run ``sample_num``
        parallel prior rollouts between anchor frames; at each anchor,
        collapse to the best posterior sample vs the detected keypoints and
        retroactively keep the in-between trajectory whose extra prior
        sample lands closest to that anchor.

        Scanned/jittable: anchor positions are static in ``t``, so the
        rollout is one ``lax.scan`` with a per-step anchor flag selecting
        the collapse branch, and the retroactive segment selection becomes
        a reverse scan propagating each anchor's trajectory index back over
        its segment.  The default ``sample_num`` matches the reference's
        10000 (vis_interpolation.py:54) — the sample axis is fully
        vectorised, so large S is cheap on the MXU.
        :meth:`_interpolate_eager` is the step-by-step oracle this is
        parity-tested against (tests/test_models.py).

        Returns selected keypoints (1, T, K, 4) with intensities frozen to
        frame 0 (reference :136).
        """
        B, T, K, _ = keypoints.shape
        assert B == 1
        S = sample_num
        offset = self.get_offset(keypoints, skeleton.parents)
        offset_rep = jnp.tile(offset, (S, 1, 1))
        h0 = jnp.broadcast_to(self.init_state, (S, self._H))
        rng = self.make_rng("sample")
        keys = jnp.stack([jax.random.fold_in(rng, t) for t in range(T)])
        kp_det_seq = keypoints[0].reshape(T, K * 4)

        # anchor positions are STATIC in t, so the anchor/between split is
        # hoisted to Python level: anchor steps run unrolled and the
        # in-between stretches are uniform prior-only lax.scans.  (A
        # traced per-step lax.cond inside one scan lowers to
        # select-both-branches — every step then pays the anchor branch's
        # two extra decodes, ~3x the decode work at S=10000.)
        anchors = [t for t in range(T)
                   if t % anchor_rate == 0 or t == T - 1]
        anchor_set = set(anchors)

        def between_step(h, key):
            prior_mean, prior_std = self._dist_params(
                h, self.prior_l1, self.prior_l2)
            z = prior_mean + prior_std * jax.random.normal(
                key, prior_mean.shape, prior_mean.dtype)
            kp_flat, _ = self.extract_kypt_from_latent_and_state(
                jnp.concatenate([h, z], axis=-1), offset_rep, skeleton)
            h_new = self._gru(jnp.concatenate([kp_flat, z], axis=-1), h)
            return h_new, kp_flat

        def anchor_step(h, key, kp_det):
            kp_det_rep = jnp.broadcast_to(kp_det[None], (S, K * 4))
            k1, k2 = jax.random.split(key)
            post_mean, post_std, prior_mean, prior_std = \
                self._post_prior_fused(h, kp_det_rep)
            z_post = post_mean + post_std * jax.random.normal(
                k1, post_mean.shape, post_mean.dtype)
            z_choose = prior_mean + prior_std * jax.random.normal(
                k2, prior_mean.shape, prior_mean.dtype)
            kp_post, _ = self.extract_kypt_from_latent_and_state(
                jnp.concatenate([h, z_post], axis=-1), offset_rep,
                skeleton)
            kp_choose, _ = self.extract_kypt_from_latent_and_state(
                jnp.concatenate([h, z_choose], axis=-1), offset_rep,
                skeleton)
            best = jnp.argmin(jnp.sum(
                (kp_post - kp_det_rep) ** 2, axis=-1))
            kp_best = jnp.broadcast_to(kp_post[best][None], (S, K * 4))
            z = jnp.broadcast_to(z_post[best][None], z_post.shape)
            h_c = jnp.broadcast_to(h[best][None], h.shape)
            choose = jnp.argmin(jnp.sum(
                (kp_choose - kp_best) ** 2, axis=-1)).astype(jnp.int32)
            h_new = self._gru(jnp.concatenate([kp_best, z], axis=-1), h_c)
            return h_new, kp_det_rep, choose

        h = h0
        kp_parts = [None] * T
        chooses = {}
        t = 0
        while t < T:
            if t in anchor_set:
                h, kp_store, choose = anchor_step(h, keys[t],
                                                  kp_det_seq[t])
                kp_parts[t] = kp_store
                chooses[t] = choose
                t += 1
            else:
                nxt = min(a for a in anchors if a > t)
                h, kp_seq = jax.lax.scan(between_step, h, keys[t:nxt])
                for i in range(nxt - t):
                    kp_parts[t + i] = kp_seq[i]
                t = nxt
        kp_all = jnp.stack(kp_parts)  # (T, S, K*4)
        # selection index for step t = the nearest anchor >= t's choose
        sel_idx = jnp.stack(
            [chooses[min(a for a in anchors if a >= t)]
             for t in range(T)])

        selected = jnp.take_along_axis(
            kp_all, sel_idx[:, None, None], axis=1)[:, 0]  # (T, K*4)
        out = selected.reshape(1, T, K, 4)
        # freeze intensities to frame 0 (vis_interpolation.py:136)
        out = out.at[0, :, :, -1].set(out[0, 0, :, -1])
        return out

    def _interpolate_eager(self, keypoints, skeleton: SkeletonArrays,
                           anchor_rate: int = 10, sample_num: int = 256):
        """Step-by-step (unjittable) transcription of the reference's
        interpolation loop — kept as the oracle the scanned
        :meth:`interpolate` is parity-tested against.
        """
        B, T, K, _ = keypoints.shape
        assert B == 1
        S = sample_num
        offset = self.get_offset(keypoints, skeleton.parents)
        offset_rep = jnp.tile(offset, (S, 1, 1))
        h = jnp.broadcast_to(self.init_state, (S, self._H))
        rng = self.make_rng("sample")

        selected = []
        segment = []  # list of (S, K*4) per in-between step

        for t in range(T):
            key = jax.random.fold_in(rng, t)
            keypoint_flat = jnp.broadcast_to(
                keypoints[:, t].reshape(1, -1), (S, K * 4))
            if t % anchor_rate == 0 or t == T - 1:
                # fused form, matching the scanned path bit-for-bit
                post_mean, post_std, prior_mean, prior_std = \
                    self._post_prior_fused(h, keypoint_flat)
                k1, k2 = jax.random.split(key)
                z_post = post_mean + post_std * jax.random.normal(
                    k1, post_mean.shape, post_mean.dtype)
                z_choose = prior_mean + prior_std * jax.random.normal(
                    k2, prior_mean.shape, prior_mean.dtype)
                kp_post, _ = self.extract_kypt_from_latent_and_state(
                    jnp.concatenate([h, z_post], axis=-1), offset_rep,
                    skeleton)
                kp_choose, _ = self.extract_kypt_from_latent_and_state(
                    jnp.concatenate([h, z_choose], axis=-1), offset_rep,
                    skeleton)
                # collapse to best posterior sample vs detected keypoints
                best = jnp.argmin(jnp.sum(
                    (kp_post - keypoint_flat) ** 2, axis=-1))
                kp_flat = jnp.broadcast_to(kp_post[best][None], (S, K * 4))
                z = jnp.broadcast_to(z_post[best][None], z_post.shape)
                h = jnp.broadcast_to(h[best][None], h.shape)
                # retroactively select the in-between trajectory
                choose = jnp.argmin(jnp.sum(
                    (kp_choose - kp_flat) ** 2, axis=-1))
                segment.append(keypoint_flat)
                for stored in segment:
                    selected.append(stored[choose].reshape(K, 4))
                segment = []
            else:
                prior_mean, prior_std = self._dist_params(
                    h, self.prior_l1, self.prior_l2)
                z = prior_mean + prior_std * jax.random.normal(
                    key, prior_mean.shape, prior_mean.dtype)
                kp_flat, _ = self.extract_kypt_from_latent_and_state(
                    jnp.concatenate([h, z], axis=-1), offset_rep, skeleton)
                segment.append(kp_flat)
            h = self._gru(jnp.concatenate([kp_flat, z], axis=-1), h)

        out = jnp.stack(selected, axis=0)[None]  # (1, T', K, 4)
        # freeze intensities to frame 0 (vis_interpolation.py:136)
        out = out.at[0, :, :, -1].set(out[0, 0, :, -1])
        return out

    def get_offset(self, keypoints, parents):
        """Bone offsets: median inter-keypoint distance to parent scaled
        frozen unit directions (hsvrnn_bvh.py:236-253).

        torch.median returns the LOWER of the two middle values for even T;
        replicated via sort + index (T-1)//2.
        """
        B, T, K, _ = keypoints.shape
        pos = keypoints[..., :3]
        dist = jnp.sqrt(jnp.sum(
            (pos[:, :, :, None] - pos[:, :, None]) ** 2, axis=-1))  # (B,T,K,K)
        med = jnp.sort(dist, axis=1)[:, (T - 1) // 2]  # (B, K, K)
        scale = jnp.take_along_axis(
            med, parents[None, :, None].astype(jnp.int32),
            axis=-1)[..., 0]  # (B, K): med[:, k, parents[k]]

        direction = self.offset_param / (jnp.sqrt(jnp.sum(
            self.offset_param ** 2, axis=-1, keepdims=True)) + 1e-10)
        offset = direction[None] * scale[..., None]
        # offsets are never trained (offset_param frozen + .detach upstream)
        return jax.lax.stop_gradient(offset)

    def _best_of_n(self, prev_state, z_samples, offset_rep,
                   skeleton, keypoint_flat):
        """Decode N samples, pick per-batch argmin L2 to the detected
        keypoints (hsvrnn_bvh.py:107-123), vectorised over the sample axis.
        """
        S_num, B, Z = z_samples.shape
        H = self._H
        state_rep = jnp.broadcast_to(prev_state[None], (S_num, B, H))
        dec_in = jnp.concatenate([state_rep, z_samples], axis=-1)
        dec_in = dec_in.reshape(S_num * B, H + Z)
        kypt_flat, R = self.extract_kypt_from_latent_and_state(
            dec_in, offset_rep, skeleton)
        kypt_flat = kypt_flat.reshape(S_num, B, -1)
        R = R.reshape(S_num, B, self._K, 3, 3)

        d = jnp.sum((keypoint_flat[None] - kypt_flat) ** 2, axis=-1)  # (S, B)
        best = jnp.argmin(d, axis=0)  # (B,)
        b_idx = jnp.arange(B)
        return (z_samples[best, b_idx], kypt_flat[best, b_idx],
                R[best, b_idx])

    # ----------------------------------------------------------------- encode
    def encode(self, keypoints, skeleton: SkeletonArrays,
               sample_num: int = 10) -> dict[str, Any]:
        """Posterior-driven rollout with best-of-N sampling.

        ``keypoints``: (B, T, K, D+1), already stop-gradiented by the caller
        (reference neural_marionette.py:53 detaches).  Reference
        hsvrnn_bvh.py:67-156.
        """
        B, T, K, _ = keypoints.shape
        offset = self.get_offset(keypoints, skeleton.parents)
        offset_rep = jnp.tile(offset, (sample_num, 1, 1))
        h0 = jnp.broadcast_to(self.init_state, (B, self._H))
        keys = jax.random.split(self.make_rng("sample"), T)

        def step(h, inp):
            key, keypoint = inp
            keypoint_flat = keypoint.reshape(B, -1)
            post_mean, post_std, prior_mean, prior_std = \
                self._post_prior_fused(h, keypoint_flat)
            eps = jax.random.normal(key, (sample_num, B, self._Z),
                                    dtype=post_mean.dtype)
            z_samples = post_mean[None] + post_std[None] * eps
            best_z, best_kypt, best_R = self._best_of_n(
                h, z_samples, offset_rep, skeleton, keypoint_flat)
            h_new = self._gru(
                jnp.concatenate([best_kypt, best_z], axis=-1), h)
            kl = gaussian_kl(post_mean, post_std, prior_mean, prior_std)
            return h_new, (best_kypt, best_R, best_z, h_new, kl)

        _, (kypts, Rs, zs, hs, kls) = jax.lax.scan(
            step, h0, (keys, jnp.moveaxis(keypoints, 1, 0)))

        keypoints_inferred = jnp.moveaxis(kypts, 0, 1).reshape(B, T, K, -1)
        R_inferred = jnp.moveaxis(Rs, 0, 1)
        z_kypts = jnp.moveaxis(zs, 0, 1)
        h_kypts = jnp.concatenate(
            [h0[:, None], jnp.moveaxis(hs, 0, 1)], axis=1)
        kl_kypt = jnp.moveaxis(kls, 0, 1)  # (B, T, Z)

        kypt_recon_loss = jnp.sum(
            (keypoints_inferred - keypoints) ** 2, axis=(2, 3))  # (B, T)

        return dict(
            kypt_recon=keypoints_inferred[..., :4],
            R=R_inferred,
            z_kypts=z_kypts,
            h_kypts=h_kypts,
            kl_kypt=jnp.mean(kl_kypt),
            kypt_recon_loss=jnp.mean(kypt_recon_loss),
            gae_recon_loss=jnp.zeros((), keypoints.dtype),   # dead upstream
            topo_recon_loss=jnp.zeros((), keypoints.dtype),  # dead upstream
        )

    # --------------------------------------------------------------- generate
    def generate(self, keypoints_cond, skeleton: SkeletonArrays,
                 Ttot: int = 10, Tcond: int = 3,
                 sample_num: int = 10) -> dict[str, Any]:
        """Conditioned posterior steps then prior rollout
        (reference hsvrnn_bvh.py:158-234)."""
        B, _, K, _ = keypoints_cond.shape
        offset = self.get_offset(keypoints_cond, skeleton.parents)
        offset_rep = jnp.tile(offset, (sample_num, 1, 1))
        h0 = jnp.broadcast_to(self.init_state, (B, self._H))
        rng = self.make_rng("sample")
        cond_keys = jax.random.split(jax.random.fold_in(rng, 0), Tcond)
        gen_keys = jax.random.split(jax.random.fold_in(rng, 1), Ttot - Tcond)

        def cond_step(h, inp):
            key, keypoint = inp
            keypoint_flat = keypoint.reshape(B, -1)
            post_mean, post_std = self._dist_params(
                jnp.concatenate([h, keypoint_flat], axis=-1),
                self.post_l1, self.post_l2)
            eps = jax.random.normal(key, (sample_num, B, self._Z),
                                    dtype=post_mean.dtype)
            z_samples = post_mean[None] + post_std[None] * eps
            best_z, best_kypt, _ = self._best_of_n(
                h, z_samples, offset_rep, skeleton, keypoint_flat)
            h_new = self._gru(
                jnp.concatenate([best_kypt, best_z], axis=-1), h)
            return h_new, best_kypt

        h, cond_kypts = jax.lax.scan(
            cond_step, h0, (cond_keys, jnp.moveaxis(keypoints_cond, 1, 0)))

        def gen_step(h, key):
            prior_mean, prior_std = self._dist_params(
                h, self.prior_l1, self.prior_l2)
            eps = jax.random.normal(key, prior_mean.shape,
                                    dtype=prior_mean.dtype)
            z = prior_mean + prior_std * eps
            kypt_flat, _ = self.extract_kypt_from_latent_and_state(
                jnp.concatenate([h, z], axis=-1), offset, skeleton)
            h_new = self._gru(jnp.concatenate([kypt_flat, z], axis=-1), h)
            return h_new, kypt_flat

        _, gen_kypts = jax.lax.scan(gen_step, h, gen_keys)

        keypoints_inferred = jnp.moveaxis(cond_kypts, 0, 1).reshape(
            B, Tcond, K, -1)
        keypoints_generated = jnp.moveaxis(gen_kypts, 0, 1).reshape(
            B, Ttot - Tcond, K, -1)
        return dict(
            keypoints_cond=keypoints_inferred[..., :4],
            keypoints_gen=keypoints_generated[..., :4],
        )
