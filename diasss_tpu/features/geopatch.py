"""World-aligned geo-patch descriptors — the sonar-native matching descriptor.

A new capability beyond the reference (which inherits image-space SIFT from
ORB-SLAM2, /root/reference/thirdparty/ORBextractor.cpp:1043-1047): sample the
normalized waterfall intensities on a WORLD-ALIGNED metric grid around each
keypoint, using the frame's geo-referencing map (frame.cpp:126-165) to invert
image->world locally.  Two passes over the same seafloor patch — regardless of
heading, port/starboard side, or along-track direction — then produce the same
descriptor up to speckle, because the grid lives in world coordinates:

* opposite-heading parallel passes: image-space 180-degree flips vanish;
* perpendicular tie lines: image-space rotations vanish;
* anisotropic pixel scales (0.1-0.4 m/bin across vs ping spacing along) are
  resampled away.

Image-space SIFT fails on exactly these (measured ~10% NN precision across
passes on drifting synthetic surveys vs ~100% for geo-patches — see
NOTES_ROUND1.md).

The local inverse map is the 2x2 Jacobian d(world)/d(bin, ping) of the geo
image by central differences at the keypoint, inverted in closed form; the
patch is bilinear-sampled at the pixel coords of each world grid node.  The
descriptor is mean-subtracted and L2-normalized, so the matcher's dot-product
matrix (one MXU matmul) IS the normalized cross-correlation.

Everything is batched over keypoints: (K, 2, 2) inverses + (K, G) gathers —
no per-keypoint host loop.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("half", "res"))
def geo_patch_descriptors(
    norm_img: jnp.ndarray,  # (N, M) normalized waterfall (uint8 or float)
    geo: jnp.ndarray,  # (N, M, 2) world (x, y) per pixel
    xy: jnp.ndarray,  # (K, 2) keypoint (col, row) = (bin, ping)
    half: int = 8,  # patch half-extent in grid cells
    res: float = 0.5,  # grid resolution in meters
):
    """Returns ``(desc, ok)``: (K, (2*half+1)^2) unit descriptors and a (K,)
    validity mask (false where the local Jacobian is singular — e.g. exactly at
    nadir — or the patch has no contrast)."""
    img = norm_img.astype(jnp.float32)
    n, m = img.shape
    b = xy[:, 0].astype(jnp.int32)
    p = xy[:, 1].astype(jnp.int32)
    bc = jnp.clip(b, 1, m - 2)
    pc = jnp.clip(p, 1, n - 2)

    # central-difference world Jacobian wrt (bin, ping): world ~ J @ (db, dp)
    dgb = (geo[pc, bc + 1] - geo[pc, bc - 1]) * 0.5  # (K, 2)
    dgp = (geo[pc + 1, bc] - geo[pc - 1, bc]) * 0.5  # (K, 2)
    J = jnp.stack([dgb, dgp], axis=-1)  # (K, 2, 2)
    det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
    ok = jnp.abs(det) > 1e-6
    det_safe = jnp.where(ok, det, 1.0)
    Jinv = (
        jnp.stack(
            [
                jnp.stack([J[:, 1, 1], -J[:, 0, 1]], -1),
                jnp.stack([-J[:, 1, 0], J[:, 0, 0]], -1),
            ],
            1,
        )
        / det_safe[:, None, None]
    )

    # world-aligned grid -> per-keypoint fractional pixel offsets
    g = jnp.arange(-half, half + 1, dtype=jnp.float32) * res
    oy, ox = jnp.meshgrid(g, g, indexing="ij")
    offs = jnp.stack([ox.ravel(), oy.ravel()])  # (2, G) world offsets
    pix = jnp.einsum("kab,bg->kag", Jinv, offs)  # (K, 2, G): (dbin, dping)
    sb = b[:, None].astype(jnp.float32) + pix[:, 0]
    sp = p[:, None].astype(jnp.float32) + pix[:, 1]

    # bilinear sample; out-of-image nodes fall back to the patch mean
    sb0 = jnp.clip(jnp.floor(sb), 0, m - 2).astype(jnp.int32)
    sp0 = jnp.clip(jnp.floor(sp), 0, n - 2).astype(jnp.int32)
    fb = jnp.clip(sb - sb0, 0.0, 1.0)
    fp = jnp.clip(sp - sp0, 0.0, 1.0)
    v = (
        img[sp0, sb0] * (1 - fb) * (1 - fp)
        + img[sp0, sb0 + 1] * fb * (1 - fp)
        + img[sp0 + 1, sb0] * (1 - fb) * fp
        + img[sp0 + 1, sb0 + 1] * fb * fp
    )  # (K, G)
    inb = (sb >= 0) & (sb <= m - 1) & (sp >= 0) & (sp <= n - 1)
    cnt = jnp.maximum(jnp.sum(inb, axis=1, keepdims=True), 1)
    mean = jnp.sum(jnp.where(inb, v, 0.0), axis=1, keepdims=True) / cnt
    v = jnp.where(inb, v, mean) - mean
    nrm = jnp.linalg.norm(v, axis=1, keepdims=True)
    desc = v / jnp.maximum(nrm, 1e-6)
    return desc, ok & (nrm[:, 0] > 1e-3)


def attach_geo_patch_descriptors(feats, norm_img, geo, cfg):
    """Replace ``feats.desc`` with world-aligned geo-patch descriptors computed
    against ``geo`` (DR geo on the first pass; drift-compensated geo on
    re-match iterations).  Keypoints with a singular local Jacobian or zero
    patch contrast are invalidated."""
    desc, ok = geo_patch_descriptors(
        norm_img, geo, feats.xy, half=cfg.geopatch_half, res=cfg.geopatch_res
    )
    return feats._replace(desc=desc, valid=feats.valid & ok)


def attach_geo_patch_descriptors_batch(feats_list, norm_list, geo_list, cfg):
    """Whole-survey geo-patch attach: ONE vmapped device program over stacked
    frames when every frame shares image shape and keypoint capacity (the
    per-frame loop costs a dispatch — and a tunnel round trip — per frame).
    Falls back to the per-frame loop on mixed shapes; identical outputs."""
    same = (
        len({tuple(n.shape) for n in norm_list}) == 1
        and len({f.xy.shape[0] for f in feats_list}) == 1
    )
    if not same or len(feats_list) <= 1:
        return [
            attach_geo_patch_descriptors(f, n, g, cfg)
            for f, n, g in zip(feats_list, norm_list, geo_list)
        ]
    descs, oks = jax.vmap(
        lambda nm, ge, xy: geo_patch_descriptors(
            nm, ge, xy, half=cfg.geopatch_half, res=cfg.geopatch_res
        )
    )(
        (jnp.stack(list(norm_list))
         if isinstance(norm_list[0], jax.Array)
         # host imagery (eager ndarray or lazy view): one stacked upload
         else jnp.asarray(np.stack([np.asarray(nm) for nm in norm_list]))),
        jnp.stack(list(geo_list)),
        jnp.stack([f.xy for f in feats_list]),
    )
    return [
        f._replace(desc=descs[i], valid=f.valid & oks[i])
        for i, f in enumerate(feats_list)
    ]
