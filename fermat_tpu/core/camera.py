"""Pinhole camera model + primary ray generation.

Reference: src/camera.h — Camera{eye, aim, up, dx, fov(radians)}; the
U,V,W frame of camera_frame (camera.h:142-171); NDC direction sampling
(camera.h:183-192); solid-angle pdfs and inversion (camera.h:205-251) used by
the bidirectional integrators; manipulation ops rotate/walk/pan/zoom
(camera.h:65-119) used by the interactive frontend.

Camera text files (e.g. models/CornellBox/camera-frontal.txt) are four lines:
eye, aim, up, fov-in-radians — parsed by load_camera_file (the reference reads
them at renderer.cu:510-522).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fermat_tpu.core.math import Vec3, cross, dot, normalize

Array = jax.Array


class Camera(NamedTuple):
    eye: Vec3  # scalar Vec3
    aim: Vec3
    up: Vec3
    fov: Array  # full horizontal field of view, radians

    @staticmethod
    def create(eye, aim, up=(0.0, 1.0, 0.0), fov=math.radians(60.0)) -> "Camera":
        f3 = lambda v: Vec3(*(jnp.float32(c) for c in v))
        return Camera(f3(eye), f3(aim), f3(up), jnp.float32(fov))

    # -- manipulation (camera.h:65-119) -----------------------------------
    def walk(self, delta: float) -> "Camera":
        d = (self.aim - self.eye) * delta
        return self._replace(eye=self.eye + d, aim=self.aim + d)

    def pan(self, dx: float, dy: float) -> "Camera":
        u, v, w = camera_frame(self, 1.0)
        off = normalize(u) * (-dx) + normalize(v) * dy
        return self._replace(eye=self.eye + off, aim=self.aim + off)

    def zoom(self, delta: float) -> "Camera":
        fov = jnp.clip(self.fov * (1.0 + delta), 0.05, math.pi - 0.1)
        return self._replace(fov=fov)

    def rotate(self, rx: float, ry: float) -> "Camera":
        """Orbit eye about aim: rx around the camera's right axis, ry around world +y."""
        u, _, _ = camera_frame(self, 1.0)
        axis_x = normalize(u)
        d = self.eye - self.aim
        d = _rotate_about(d, axis_x, rx)
        up = _rotate_about(self.up, axis_x, rx)
        axis_y = Vec3(jnp.float32(0), jnp.float32(1), jnp.float32(0))
        d = _rotate_about(d, axis_y, ry)
        up = _rotate_about(up, axis_y, ry)
        return self._replace(eye=self.aim + d, up=up)

    def square_screen_focal_length(self) -> Array:
        """Image-plane distance giving a unit-area screen (camera.h:131-136)."""
        t = jnp.tan(self.fov / 2.0)
        return 0.25 / (t * t)


def _rotate_about(v: Vec3, axis: Vec3, angle: float) -> Vec3:
    """Rodrigues rotation."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    return v * c + cross(axis, v) * s + axis * (dot(axis, v) * (1.0 - c))


def camera_frame(cam: Camera, aspect_ratio: float) -> Tuple[Vec3, Vec3, Vec3]:
    """U, V, W frame exactly as camera.h:142-171.

    W = aim - eye (unnormalized!); |U| = |W| tan(fov/2); |V| = |U| / aspect.
    """
    w = cam.aim - cam.eye
    wlen = jnp.sqrt(dot(w, w))
    u = normalize(cross(w, cam.up))
    v = normalize(cross(u, w))
    ulen = wlen * jnp.tan(cam.fov / 2.0)
    return u * ulen, v * (ulen / aspect_ratio), w


class CameraSampler(NamedTuple):
    """Precomputed frame + pdf helper (camera.h:256-300)."""

    u: Vec3
    v: Vec3
    w: Vec3
    w_len: Array
    square_focal_length: Array

    @staticmethod
    def create(cam: Camera, aspect_ratio: float) -> "CameraSampler":
        u, v, w = camera_frame(cam, aspect_ratio)
        return CameraSampler(u, v, w, jnp.sqrt(dot(w, w)), cam.square_screen_focal_length())

    def sample_direction(self, ndc_x: Array, ndc_y: Array) -> Vec3:
        """NDC in [0,1]^2 -> unnormalized direction d = (2x-1)U + (2y-1)V + W."""
        dx = ndc_x * 2.0 - 1.0
        dy = ndc_y * 2.0 - 1.0
        return Vec3(
            dx * self.u.x + dy * self.v.x + self.w.x,
            dx * self.u.y + dy * self.v.y + self.w.y,
            dx * self.u.z + dy * self.v.z + self.w.z,
        )

    def invert(self, out: Vec3) -> Tuple[Array, Array]:
        """Direction -> NDC (camera.h:195-201); (-1,-1) when behind the camera."""
        t = dot(out, self.w) / (self.w_len * self.w_len)
        i = out / jnp.where(t <= 0.0, 1.0, t) - self.w
        ix = dot(i, self.u) / dot(self.u, self.u)
        iy = dot(i, self.v) / dot(self.v, self.v)
        ok = t > 0.0
        return (
            jnp.where(ok, ix * 0.5 + 0.5, -1.0),
            jnp.where(ok, iy * 0.5 + 0.5, -1.0),
        )

    def pdf(self, out: Vec3, projected: bool = False) -> Array:
        """Solid-angle (or projected) pdf of the direction sampler (camera.h:205-251)."""
        t = dot(out, self.w) / (self.w_len * self.w_len)
        i = out / jnp.where(t <= 0.0, 1.0, t) - self.w
        ix = dot(i, self.u) / dot(self.u, self.u)
        iy = dot(i, self.v) / dot(self.v, self.v)
        inside = (t > 0.0) & (jnp.abs(ix) <= 1.0) & (jnp.abs(iy) <= 1.0)
        cos_theta = dot(normalize(out), self.w) / self.w_len
        p = self.square_focal_length / jnp.maximum(
            cos_theta ** (4 if projected else 3), 1e-12
        )
        return jnp.where(inside, p, 0.0)

    def w_e(self, out: Vec3) -> Array:
        """Pinhole importance (projected pdf) — bpt camera connections."""
        return self.pdf(out, projected=True)


def generate_camera_rays(
    cam: Camera,
    res_x: int,
    res_y: int,
    jitter_x: Array,
    jitter_y: Array,
    pix: Array = None,
):
    """Primary rays, one lane per pixel id.

    Matches generate_primary_rays (src/pathtracer_kernels.h:134-181): pixel
    (x, y) maps to NDC ((x + jx)/res_x, (y + jy)/res_y).

    jitter_x/y: per-lane uniforms. `pix` defaults to the full pixel grid;
    pass a subset for tile-sharded rendering (fermat_tpu.parallel).
    Returns (origin Vec3, dir Vec3 — *normalized*, pixel ids).
    """
    if pix is None:
        pix = jnp.arange(res_x * res_y, dtype=jnp.uint32)
    px = (pix % jnp.uint32(res_x)).astype(jnp.float32)
    py = (pix // jnp.uint32(res_x)).astype(jnp.float32)
    sampler = CameraSampler.create(cam, res_x / res_y)
    ndc_x = (px + jitter_x) / res_x
    ndc_y = (py + jitter_y) / res_y
    d = sampler.sample_direction(ndc_x, ndc_y)
    d = normalize(d)
    o = Vec3(
        jnp.broadcast_to(cam.eye.x, d.x.shape),
        jnp.broadcast_to(cam.eye.y, d.y.shape),
        jnp.broadcast_to(cam.eye.z, d.z.shape),
    )
    return o, d, pix


def load_camera_file(path: str) -> Camera:
    """Parse the 4-line eye/aim/up/fov camera text files (renderer.cu:510-522)."""
    vals = []
    with open(path, "r") as f:
        for line in f:
            vals.extend(float(tok) for tok in line.replace(",", " ").split())
    if len(vals) < 10:
        raise ValueError(f"camera file {path}: expected 10 floats, got {len(vals)}")
    return Camera.create(vals[0:3], vals[3:6], vals[6:9], vals[9])
