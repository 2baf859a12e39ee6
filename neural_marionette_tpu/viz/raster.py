"""Small software rasterizer for the demo render sets.

The reference renders its demos with Open3D offscreen visualizers:
surfel "plates" with estimated normals for generation
(vis_generation.py:27-44, 155-192), and textured / smooth-shaded /
skeleton-cone / overlay views for retargeting
(vis_retarget.py:102-153, 399-557).  Open3D is not installable in this
environment, so this module reproduces the same output inventory with a
NumPy z-buffer splat renderer:

* meshes and surfels are converted to shaded sample points
  (barycentric samples per triangle, disc samples per surfel);
* samples are depth-sorted far-to-near and painted into the frame
  (nearest-wins overwrite == z-buffer);
* shading is Lambertian with a headlight + fill term, matching the look
  of Open3D's default shader closely enough for the demo GIFs.

Everything is plain NumPy on the host — rendering is presentation-layer,
not a TPU workload.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np


# ---------------------------------------------------------------- camera
class Camera(NamedTuple):
    eye: np.ndarray
    R: np.ndarray      # world -> camera rotation (rows = right, up, fwd)
    f: float           # focal length in pixels
    W: int
    H: int
    cx: Optional[float] = None   # principal point (defaults to W/2, H/2)
    cy: Optional[float] = None

    @classmethod
    def look_at(cls, eye, center=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
                fov_deg: float = 60.0, W: int = 512, H: int = 512):
        eye = np.asarray(eye, np.float64)
        fwd = np.asarray(center, np.float64) - eye
        fwd /= np.linalg.norm(fwd) + 1e-12
        right = np.cross(fwd, np.asarray(up, np.float64))
        right /= np.linalg.norm(right) + 1e-12
        true_up = np.cross(right, fwd)
        R = np.stack([right, true_up, fwd])
        f = 0.5 * W / np.tan(np.deg2rad(fov_deg) / 2)
        return cls(eye=eye, R=R, f=f, W=W, H=H)

    @classmethod
    def from_o3d_json(cls, path: str):
        """Open3D ``PinholeCameraParameters`` JSON -> Camera.

        This is what every reference demo renders through
        (``data/demo/source/source.json``, used at reference
        vis_generation.py:171-177 and vis_retarget.py:399-557).  Open3D
        stores the 4x4 world->camera extrinsic COLUMN-major with camera
        axes (x right, y down, z forward); ours are (right, up, fwd) with
        y up — so the extrinsic's y row is negated and
        ``eye = -E[:3,:3]^T @ E[:3,3]``.
        """
        import json as _json
        with open(path) as fh:
            d = _json.load(fh)
        E = np.asarray(d["extrinsic"], np.float64).reshape(4, 4).T
        K = np.asarray(d["intrinsic"]["intrinsic_matrix"],
                       np.float64).reshape(3, 3).T
        Re, t = E[:3, :3], E[:3, 3]
        eye = -Re.T @ t
        R = np.stack([Re[0], -Re[1], Re[2]])
        return cls(eye=eye, R=R, f=float(K[0, 0]),
                   W=int(d["intrinsic"]["width"]),
                   H=int(d["intrinsic"]["height"]),
                   cx=float(K[0, 2]), cy=float(K[1, 2]))

    def project(self, pts: np.ndarray):
        """(N, 3) world -> (u, v, depth); u/v in pixels."""
        cx = self.W / 2 if self.cx is None else self.cx
        cy = self.H / 2 if self.cy is None else self.cy
        p = (pts - self.eye) @ self.R.T
        z = np.maximum(p[:, 2], 1e-6)
        u = cx + self.f * p[:, 0] / z
        v = cy - self.f * p[:, 1] / z
        return u, v, z


DEFAULT_CAM = dict(eye=(1.6, 1.2, 2.2), center=(0.0, 0.0, 0.0))

# vendored copy of the reference's demo camera (plain data; provenance:
# /root/reference/data/demo/source/source.json — same path layout)
REFERENCE_CAMERA_JSON = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "data", "demo", "source",
    "source.json")


def default_camera(json_path: Optional[str] = None) -> Camera:
    """The demos' default view: the reference's pinhole camera when its
    JSON is available (vendored or pointed at via ``json_path`` /
    ``NM_CAMERA_JSON``), else the legacy look_at fallback."""
    path = json_path or os.environ.get("NM_CAMERA_JSON",
                                       REFERENCE_CAMERA_JSON)
    if path and os.path.exists(path):
        return Camera.from_o3d_json(path)
    return Camera.look_at(**DEFAULT_CAM)


# ------------------------------------------------------------- splatting
def splat(cam: Camera, pts: np.ndarray, colors: np.ndarray,
          img: Optional[np.ndarray] = None, px: int = 1,
          bg: float = 1.0) -> np.ndarray:
    """Depth-sorted point splat (nearest wins).  pts (N,3), colors (N,3)
    in [0,1]; px = splat half-extent in pixels."""
    if img is None:
        img = np.full((cam.H, cam.W, 3), bg, np.float32)
    if len(pts) == 0:
        return img
    u, v, z = cam.project(np.asarray(pts, np.float64))
    order = np.argsort(-z)  # far first; near overwrites
    ui = np.round(u[order]).astype(np.int64)
    vi = np.round(v[order]).astype(np.int64)
    c = np.asarray(colors, np.float32)[order]
    for du in range(-px + 1, px):
        for dv in range(-px + 1, px):
            uu, vv = ui + du, vi + dv
            ok = (uu >= 0) & (uu < cam.W) & (vv >= 0) & (vv < cam.H)
            img[vv[ok], uu[ok]] = c[ok]
    return img


def shade(colors: np.ndarray, normals: np.ndarray, light_dir,
          ambient: float = 0.35) -> np.ndarray:
    l = np.asarray(light_dir, np.float64)
    l = l / (np.linalg.norm(l) + 1e-12)
    lam = np.abs(normals @ l)  # two-sided, like Open3D's default
    return np.clip(colors * (ambient + (1 - ambient) * lam[:, None]), 0, 1)


# ------------------------------------------------------- normal estimation
def estimate_normals(points: np.ndarray, k: int = 8,
                     chunk: int = 1024) -> np.ndarray:
    """k-NN PCA normals (the open3d estimate_normals analogue),
    consistently oriented away from the centroid."""
    pts = np.asarray(points, np.float64)
    N = len(pts)
    k = min(k, N - 1) if N > 1 else 0
    normals = np.zeros_like(pts)
    if k < 2:
        normals[:, 2] = 1.0
        return normals
    for s in range(0, N, chunk):
        blk = pts[s:s + chunk]
        d = ((blk[:, None] - pts[None]) ** 2).sum(-1)  # (c, N)
        idx = np.argpartition(d, k, axis=1)[:, :k + 1]
        nb = pts[idx]                                   # (c, k+1, 3)
        nb = nb - nb.mean(axis=1, keepdims=True)
        cov = np.einsum("cki,ckj->cij", nb, nb)
        _, vec = np.linalg.eigh(cov)
        normals[s:s + chunk] = vec[:, :, 0]             # smallest eigval
    out = pts - pts.mean(0)
    flip = (normals * out).sum(-1) < 0
    normals[flip] *= -1
    return normals


# ------------------------------------------------------------- primitives
def _align_z(direction: np.ndarray) -> np.ndarray:
    """Rotation taking +z to ``direction`` (reference drawPlate/drawCone
    Rodrigues construction, vis_generation.py:30-38)."""
    line2 = direction / (np.linalg.norm(direction) + 1e-6)
    line1 = np.array([0.0, 0.0, 1.0])
    v = np.cross(line1, line2)
    c = float(np.dot(line1, line2)) + 1e-8
    if abs(c + 1.0) < 1e-4:
        return np.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    k = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + k + k @ k / (1 + c)


def sphere_mesh(radius: float, res: int = 12):
    th = np.linspace(0, np.pi, res)
    ph = np.linspace(0, 2 * np.pi, 2 * res, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    verts = radius * np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                               np.cos(T)], -1).reshape(-1, 3)
    faces = []
    for i in range(res - 1):
        for j in range(2 * res):
            a = i * 2 * res + j
            b = i * 2 * res + (j + 1) % (2 * res)
            faces.append([a, b, a + 2 * res])
            faces.append([b, b + 2 * res, a + 2 * res])
    return verts, np.asarray(faces, np.int64)


def cone_mesh(radius: float, height: float, res: int = 24):
    ph = np.linspace(0, 2 * np.pi, res, endpoint=False)
    base = np.stack([radius * np.cos(ph), radius * np.sin(ph),
                     np.zeros(res)], -1)
    verts = np.concatenate([base, [[0, 0, height]], [[0, 0, 0]]])
    apex, center = res, res + 1
    faces = []
    for j in range(res):
        faces.append([j, (j + 1) % res, apex])
        faces.append([(j + 1) % res, j, center])
    return verts, np.asarray(faces, np.int64)


def cylinder_mesh(radius: float, height: float, res: int = 16):
    ph = np.linspace(0, 2 * np.pi, res, endpoint=False)
    ring = np.stack([radius * np.cos(ph), radius * np.sin(ph)], -1)
    bot = np.concatenate([ring, np.full((res, 1), -height / 2)], -1)
    top = np.concatenate([ring, np.full((res, 1), height / 2)], -1)
    verts = np.concatenate([bot, top, [[0, 0, -height / 2]],
                            [[0, 0, height / 2]]])
    cb, ct = 2 * res, 2 * res + 1
    faces = []
    for j in range(res):
        jn = (j + 1) % res
        faces.append([j, jn, res + j])
        faces.append([jn, res + jn, res + j])
        faces.append([jn, j, cb])
        faces.append([res + j, res + jn, ct])
    return verts, np.asarray(faces, np.int64)


def transform(verts: np.ndarray, R=None, t=None):
    out = verts
    if R is not None:
        out = out @ np.asarray(R).T
    if t is not None:
        out = out + np.asarray(t)
    return out


# -------------------------------------------------------- mesh -> samples
def mesh_samples(verts: np.ndarray, faces: np.ndarray, cam: Camera,
                 density: float = 2.0, max_samples: int = 1_500_000):
    """Barycentric samples + per-sample face normals; sample count scales
    with projected pixel area so coverage has no holes."""
    verts = np.asarray(verts, np.float64)
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    fn = np.cross(v1 - v0, v2 - v0)
    area_w = 0.5 * np.linalg.norm(fn, axis=-1)
    fn = fn / (np.linalg.norm(fn, axis=-1, keepdims=True) + 1e-12)
    # projected scale ~ f / depth
    _, _, z0 = cam.project(v0)
    px_scale = (cam.f / z0) ** 2
    n_samp = np.minimum(np.ceil(area_w * px_scale * density) + 1,
                        4096).astype(np.int64)
    total = int(n_samp.sum())
    if total > max_samples:
        n_samp = np.maximum((n_samp * (max_samples / total)).astype(np.int64),
                            1)
        total = int(n_samp.sum())
    fid = np.repeat(np.arange(len(faces)), n_samp)
    rng = np.random.default_rng(0)
    r1 = np.sqrt(rng.uniform(size=total))
    r2 = rng.uniform(size=total)
    a, b = 1 - r1, r1 * (1 - r2)
    c = 1 - a - b
    pts = (a[:, None] * v0[fid] + b[:, None] * v1[fid] + c[:, None] * v2[fid])
    bary = np.stack([a, b, c], -1)
    return pts, fn[fid], fid, bary


def render_mesh(cam: Camera, verts, faces, color=None, vert_colors=None,
                img=None, light=(0.3, 0.5, -1.0), density: float = 2.0,
                px: int = 1):
    """Smooth/flat-shaded mesh render.  ``vert_colors`` (V, 3) gives
    per-vertex (e.g. texture-sampled) colors; else uniform ``color``."""
    pts, normals, fid, bary = mesh_samples(verts, faces, cam, density)
    if vert_colors is not None:
        vc = np.asarray(vert_colors, np.float32)
        cols = (bary[:, :, None] * vc[faces[fid]]).sum(1)
    else:
        cols = np.broadcast_to(np.asarray(color, np.float32), pts.shape)
    cols = shade(cols, normals, light)
    return splat(cam, pts, cols, img=img, px=px)


def render_surfels(cam: Camera, points, normals, colors, radius=0.03,
                   img=None, n_disc: int = 24, light=(0.3, 0.5, -1.0),
                   px: int = 2):
    """Oriented disc "plates" per point (reference drawPlate,
    vis_generation.py:27-44)."""
    points = np.asarray(points, np.float64)
    normals = np.asarray(normals, np.float64)
    rng = np.random.default_rng(0)
    r = radius * np.sqrt(rng.uniform(size=n_disc))
    th = rng.uniform(0, 2 * np.pi, size=n_disc)
    disc = np.stack([r * np.cos(th), r * np.sin(th), np.zeros(n_disc)], -1)
    # per-point tangent frame from the normal
    n = normals / (np.linalg.norm(normals, axis=-1, keepdims=True) + 1e-12)
    helper = np.where(np.abs(n[:, 2:3]) < 0.9,
                      np.array([0.0, 0.0, 1.0]), np.array([1.0, 0.0, 0.0]))
    t1 = np.cross(n, helper)
    t1 /= np.linalg.norm(t1, axis=-1, keepdims=True) + 1e-12
    t2 = np.cross(n, t1)
    frame = np.stack([t1, t2, n], -1)             # (N, 3, 3) cols = axes
    pts = points[:, None] + np.einsum("nij,dj->ndi", frame, disc)
    cols = shade(np.asarray(colors, np.float32), n, light)
    cols = np.repeat(cols, n_disc, axis=0)
    return splat(cam, pts.reshape(-1, 3), cols, img=img, px=px)


def skeleton_geometry(kypts: np.ndarray, parents: np.ndarray,
                      valid: Optional[np.ndarray] = None,
                      joint_colors: Optional[np.ndarray] = None,
                      bone_color=(0.0, 0.6, 0.1), sphere_radius=0.03):
    """Spheres at joints + cones along bones (reference drawSphere /
    drawCone1/2, vis_retarget.py:102-153).  Returns (verts, faces,
    vert_colors)."""
    K = len(kypts)
    if valid is None:
        valid = np.ones(K, bool)
    if joint_colors is None:
        cm = _spaced_colors(K)
        joint_colors = cm
    av, af, ac = [], [], []
    off = 0

    def add(verts, faces, color):
        nonlocal off
        av.append(verts)
        af.append(faces + off)
        ac.append(np.broadcast_to(np.asarray(color, np.float32),
                                  verts.shape))
        off += len(verts)

    sv, sf = sphere_mesh(sphere_radius)
    for k in range(K):
        if not valid[k]:
            continue
        add(transform(sv, t=kypts[k]), sf, joint_colors[k])
        p = int(parents[k])
        if p == k or not valid[p]:
            continue
        seg = kypts[k] - kypts[p]
        length = float(np.linalg.norm(seg))
        if length < 1e-6:
            continue
        R = _align_z(seg)
        # drawCone1: base at parent + 20% margin, height 80% of the bone
        cv, cf = cone_mesh(0.03, length * 0.8 + 1e-6)
        add(transform(cv, R=R, t=kypts[p] + 0.2 * seg), cf, bone_color)
        # drawCone2: small reversed cone at the parent end
        cv2_, cf2 = cone_mesh(0.03, length * 0.2 + 1e-6)
        cv2_ = transform(cv2_, R=np.diag([1.0, -1.0, -1.0]))  # rotate pi
        add(transform(cv2_, R=R, t=kypts[p] + 0.195 * seg), cf2, bone_color)
    if not av:
        return (np.zeros((0, 3)), np.zeros((0, 3), np.int64),
                np.zeros((0, 3), np.float32))
    return np.concatenate(av), np.concatenate(af), np.concatenate(ac)


def _spaced_colors(K: int) -> np.ndarray:
    h = (np.arange(K) * 0.61803398875) % 1.0
    c = np.stack([np.abs(h * 6 - 3) - 1, 2 - np.abs(h * 6 - 2),
                  2 - np.abs(h * 6 - 4)], -1)
    return np.clip(c, 0.15, 1.0)


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def save_png(img: np.ndarray, path: str) -> None:
    import imageio
    imageio.imwrite(path, to_uint8(img))


def save_gif(frames, path: str, duration: float = 0.1) -> None:
    import imageio
    imageio.mimsave(path, [to_uint8(f) for f in frames], duration=duration)
