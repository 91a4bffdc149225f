"""SceneView — the POD pytree handed to integrator kernels.

Reference analog: RenderingContextView (src/renderer_view.h:80-131), the
plain device view of the whole context passed by value into kernels. Here it
is a pytree: jit-stable, shardable, and differentiable (material fields
inside mesh.materials are leaves gradients can flow into).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax

from fermat_tpu.accel.bvh import BvhView, build_bvh_for_mesh
from fermat_tpu.core.camera import Camera
from fermat_tpu.scene.lights import DirectionalLightsView, MeshLightsView
from fermat_tpu.scene.mesh import MeshStorage, MeshView


class SceneView(NamedTuple):
    mesh: MeshView
    bvh: BvhView
    lights: MeshLightsView
    dir_lights: DirectionalLightsView
    camera: Camera

    @staticmethod
    def build(
        storage: MeshStorage,
        camera: Camera,
        dir_light_defs=(),
        leaf_size: int = 4,
    ) -> "SceneView":
        mesh = storage.device_view()
        bvh = build_bvh_for_mesh(mesh, leaf_size=leaf_size)
        lights = MeshLightsView.build(mesh)
        dl = DirectionalLightsView.build(list(dir_light_defs))
        return SceneView(mesh=mesh, bvh=bvh, lights=lights, dir_lights=dl, camera=camera)
