"""Motion retargeting demo (reference vis_retarget.py:154-322).

Detect a source dance clip's keypoints + per-frame global rotations, detect
a target shape's bind-pose keypoints, skin the target points to the learned
skeleton, and replay the source motion on the target via LBS.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..data.pipeline import episodic_normalization
from ..models.dynamics import SkeletonArrays
from ..ops import voxelize_np
from ..retarget import retarget_motion
from .common import DemoContext, detect_and_extract_skeleton


def load_obj_vertices(path: str) -> np.ndarray:
    """Minimal OBJ vertex reader (the reference uses Open3D; only the
    vertex positions feed the retarget math)."""
    return load_obj_mesh(path)["verts"]


def load_obj_mesh(path: str) -> dict:
    """OBJ reader with faces, per-vertex UVs and the diffuse texture
    (reference renders the target as a textured Open3D mesh,
    vis_retarget.py:399-435).  Returns dict(verts, faces, uv, texture) —
    faces/uv/texture are None when absent."""
    verts, uvs, faces, face_uvs = [], [], [], []
    mtllib = None
    with open(path) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            if p[0] == "v":
                verts.append([float(p[1]), float(p[2]), float(p[3])])
            elif p[0] == "vt":
                uvs.append([float(p[1]), float(p[2])])
            elif p[0] == "mtllib":
                mtllib = p[1]
            elif p[0] == "f":
                # fan-triangulate n-gon faces; track UVs per emitted
                # triangle (None when a corner lacks a vt index) so one
                # UV-less face doesn't disable texturing for the mesh
                idx = [q.split("/") for q in p[1:]]
                for a, b in zip(range(1, len(idx) - 1),
                                range(2, len(idx))):
                    tri = [idx[0], idx[a], idx[b]]
                    faces.append([int(q[0]) - 1 for q in tri])
                    if all(len(q) > 1 and q[1] for q in tri):
                        face_uvs.append([int(q[1]) - 1 for q in tri])
                    else:
                        face_uvs.append(None)
    verts = np.asarray(verts, np.float64)
    out = dict(verts=verts, faces=None, uv=None, texture=None)
    if faces:
        out["faces"] = np.asarray(faces, np.int64)
    # per-vertex UV: first UV index seen per vertex
    uv_pairs = [(f_v, f_t) for f_v, f_t in zip(faces, face_uvs)
                if f_t is not None]
    if uv_pairs and uvs:
        uv_arr = np.asarray(uvs, np.float64)
        per_vert = np.zeros((len(verts), 2))
        seen = np.zeros(len(verts), bool)
        for f_v, f_t in uv_pairs:
            for v_i, t_i in zip(f_v, f_t):
                if not seen[v_i]:
                    per_vert[v_i] = uv_arr[t_i]
                    seen[v_i] = True
        out["uv"] = per_vert
    if mtllib:
        tex = _find_texture(os.path.join(os.path.dirname(path), mtllib))
        if tex is not None:
            out["texture"] = tex
    return out


def _find_texture(mtl_path: str):
    """map_Kd image from an .mtl file, as float RGB (or None)."""
    if not os.path.exists(mtl_path):
        return None
    tex_file = None
    with open(mtl_path) as f:
        for line in f:
            p = line.split()
            if p and p[0] == "map_Kd":
                tex_file = p[-1]
    if not tex_file:
        return None
    img_path = os.path.join(os.path.dirname(mtl_path), tex_file)
    if not os.path.exists(img_path):
        return None
    import imageio
    img = np.asarray(imageio.imread(img_path), np.float32) / 255.0
    return img[..., :3]


def load_target_points(path: str, scale: float = 0.8, x_trans: float = 0.0,
                       z_trans: float = 0.0, is_bind: bool = False,
                       return_mesh: bool = False):
    """Target shape -> normalized points (reference
    load_voxel_from_real_data_for_mesh, vis_retarget.py:92-100).

    ``return_mesh=True`` additionally returns dict(faces, uv, texture)
    aligned with the returned (deformable) points so the render layer can
    draw the textured/smooth mesh views."""
    mesh = None
    if path.endswith(".obj"):
        mesh = load_obj_mesh(path)
        x = mesh["verts"]
    else:
        x = np.load(path)[..., :3]
    if x.ndim == 3:
        # a (T, N, 3) motion clip was passed where a static target shape
        # belongs — use its first frame (rest pose) rather than crashing
        x = x[0]
    if is_bind:
        x = np.stack([x[:, 0], -x[:, 2], x[:, 1]], axis=-1)
    x = episodic_normalization(x[None], scale, x_trans, z_trans)[0]
    if return_mesh:
        return x, (None if mesh is None else
                   dict(faces=mesh["faces"], uv=mesh["uv"],
                        texture=mesh["texture"]))
    return x


def run_retarget(ctx: DemoContext, source_vox: np.ndarray,
                 target_points: np.ndarray, hardness: float = 8.0,
                 mode: str = "ours", seed: int = 0):
    """source_vox: (T, G, G, G, 1); target_points: (N, 3) in [-1, 1]^3."""
    model, params = ctx.model, ctx.params
    cfg = ctx.cfg

    # ---- source: keypoints + per-frame global rotations
    det, skeleton = detect_and_extract_skeleton(ctx, source_vox)
    source_kp = np.array(det["keypoints"])  # (1, T, K, 4), writable copy
    # freeze intensities to frame 0 for consistent rigs (vis_retarget.py:242)
    source_kp[:, 1:, :, -1] = source_kp[:, :1, :, -1]
    sk = SkeletonArrays.from_skeleton(skeleton)
    dyn = model.apply(
        params, jnp.asarray(source_kp), sk,
        method=lambda m, *a, **k: m.dyna_module.encode(*a, **k),
        rngs={"sample": jax.random.PRNGKey(seed)})
    source_R = np.asarray(dyn["R"][0])  # (T, K, 3, 3)

    # ---- target: bind-pose keypoints + inverse rotations
    target_vox = voxelize_np(target_points.astype(np.float32),
                             cfg.grid_size)
    tdet = model.apply(
        params, jnp.asarray(target_vox[None, None]),
        affinity_active=True,
        method=lambda m, v, affinity_active:
        m.kypt_detector(v, affinity_active=affinity_active))
    target_kp = np.asarray(tdet["keypoints"])  # (1, 1, K, 4)
    # transplant source frame-0 intensities (vis_retarget.py:260)
    target_kp = np.concatenate(
        [target_kp[..., :3], source_kp[:1, :1, :, 3:]], axis=-1)
    tdyn = model.apply(
        params, jnp.asarray(target_kp), sk,
        method=lambda m, *a, **k: m.dyna_module.encode(*a, **k),
        rngs={"sample": jax.random.PRNGKey(seed + 1)})
    target_R = np.asarray(tdyn["R"][0, 0])  # (K, 3, 3) bind pose

    # bone offsets from the target pose (vis_retarget.py:275)
    offset = np.asarray(model.apply(
        params, jnp.asarray(target_kp), sk.parents,
        method=lambda m, *a: m.dyna_module.get_offset(*a)))[0]  # (K, 3)

    result = retarget_motion(
        skeleton, source_kp[0], source_R, target_kp[0, 0], target_R,
        target_points, offset, hardness=hardness, mode=mode)
    return dict(result=result, skeleton=skeleton,
                source_keypoints=source_kp[0], target_keypoints=target_kp)


def save_outputs(out: dict, out_dir: str, source_vox=None,
                 target_mesh=None, target_points=None,
                 intensity_threshold: float = 0.2) -> None:
    """Write the retarget output inventory: .npy exports plus the
    reference's render sets (vis_retarget.py:325-557) — source clip with
    skeleton cones/spheres, target stills (textured + skin-weight
    colored), and the deformed result as smooth / skeleton / overlay
    (+ textured when the target was a textured OBJ) PNG sequences with
    GIFs, drawn by the software rasterizer in viz/raster.py."""
    os.makedirs(out_dir, exist_ok=True)
    res = out["result"]
    np.save(os.path.join(out_dir, "retargeted_points.npy"), res.new_points)
    np.save(os.path.join(out_dir, "retargeted_keypoints.npy"),
            res.new_keypoints)
    np.save(os.path.join(out_dir, "skin_weights.npy"), res.skin_weights)
    np.save(os.path.join(out_dir, "parents.npy"), out["skeleton"].parents)

    from ..viz import raster as R
    cam = R.default_camera()  # the reference's pinhole camera JSON
    skeleton = out["skeleton"]
    parents = skeleton.parents
    src_kp = out["source_keypoints"]  # (T, K, 4)
    valid = src_kp[0, :, -1] >= intensity_threshold
    K = src_kp.shape[1]
    joint_colors = R._spaced_colors(K)
    T = res.new_points.shape[0]

    def _seq(name, render_frame):
        img_dir = os.path.join(out_dir, name)
        os.makedirs(img_dir, exist_ok=True)
        frames = []
        for t in range(T):
            img = render_frame(t)
            R.save_png(img, os.path.join(img_dir, f"{t:02d}.png"))
            frames.append(img)
        R.save_gif(frames, os.path.join(out_dir, f"{name[:-5]}.gif"))

    # ---- source clip: occupied-voxel points + skeleton (ref :325-398)
    if source_vox is not None:
        G = source_vox.shape[1]

        def src_frame(t):
            coords = np.stack(
                np.nonzero(source_vox[t, ..., 0]), axis=-1) / ((G - 1) / 2) \
                - 1
            img = R.splat(cam, coords,
                          np.tile([[0.45, 0.45, 0.5]],
                                  (len(coords), 1)).astype(np.float32),
                          px=2)
            v, f, c = R.skeleton_geometry(src_kp[t, :, :3], parents,
                                          valid=valid,
                                          joint_colors=joint_colors)
            return R.render_mesh(cam, v, f, vert_colors=c, img=img)

        _seq("source_imgs", src_frame)

    # ---- target stills (ref :399-435): textured + skin-weight colors
    faces = (target_mesh or {}).get("faces") if target_mesh else None
    tex_colors = None
    if target_mesh and target_mesh.get("uv") is not None \
            and target_mesh.get("texture") is not None:
        tex = target_mesh["texture"]
        uv = np.clip(target_mesh["uv"], 0, 1)
        h, w = tex.shape[:2]
        tex_colors = tex[((1 - uv[:, 1]) * (h - 1)).astype(int),
                         (uv[:, 0] * (w - 1)).astype(int)]
    if target_points is not None:
        skin_colors = joint_colors[np.argmax(res.skin_weights, axis=-1)]
        if faces is not None:
            base = tex_colors if tex_colors is not None \
                else np.tile([[0.7, 0.7, 0.7]], (len(target_points), 1))
            R.save_png(R.render_mesh(cam, target_points, faces,
                                     vert_colors=base),
                       os.path.join(out_dir, "target.png"))
            R.save_png(R.render_mesh(cam, target_points, faces,
                                     vert_colors=skin_colors),
                       os.path.join(out_dir, "target_skin.png"))
        else:
            n = R.estimate_normals(target_points)
            R.save_png(R.render_surfels(
                cam, target_points, n,
                np.tile([[0.7, 0.7, 0.7]], (len(target_points), 1))),
                os.path.join(out_dir, "target.png"))
            R.save_png(R.render_surfels(cam, target_points, n,
                                        skin_colors),
                       os.path.join(out_dir, "target_skin.png"))

    # ---- deformed result views (ref :436-557)
    def mesh_or_surfels(t, colors, img=None):
        pts = res.new_points[t]
        if faces is not None:
            return R.render_mesh(cam, pts, faces, vert_colors=colors,
                                 img=img)
        n = R.estimate_normals(pts[:: max(len(pts) // 6000, 1)])
        sub = pts[:: max(len(pts) // 6000, 1)]
        c = np.asarray(colors)[:: max(len(pts) // 6000, 1)] \
            if np.ndim(colors) > 1 else np.tile(colors, (len(sub), 1))
        return R.render_surfels(cam, sub, n, c, img=img)

    smooth_base = np.tile([[0.55, 0.75, 0.85]],
                          (res.new_points.shape[1], 1)).astype(np.float32)
    _seq("smooth_imgs", lambda t: mesh_or_surfels(t, smooth_base))
    if tex_colors is not None:
        _seq("textured_imgs", lambda t: mesh_or_surfels(t, tex_colors))

    def skel_frame(t):
        v, f, c = R.skeleton_geometry(res.new_keypoints[t, :, :3], parents,
                                      valid=valid,
                                      joint_colors=joint_colors)
        return R.render_mesh(cam, v, f, vert_colors=c)

    _seq("skeleton_imgs", skel_frame)

    if source_vox is not None:
        G = source_vox.shape[1]

        def overlay_frame(t):
            coords = np.stack(
                np.nonzero(source_vox[t, ..., 0]), axis=-1) / ((G - 1) / 2) \
                - 1
            img = R.splat(cam, coords,
                          np.tile([[0.8, 0.5, 0.5]],
                                  (len(coords), 1)).astype(np.float32),
                          px=2)
            return mesh_or_surfels(t, smooth_base, img=img)

        _seq("overlay_imgs", overlay_frame)
