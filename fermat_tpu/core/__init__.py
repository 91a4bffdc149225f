from fermat_tpu.core.math import (
    Vec3,
    vec3,
    dot,
    cross,
    norm,
    normalize,
    reflect,
    refract,
    orthonormal_basis,
    to_local,
    to_world,
    oct_encode,
    oct_decode,
)
from fermat_tpu.core.rng import (
    hash_u32,
    pcg_2d,
    uniform_from_bits,
    TiledSequence,
)
from fermat_tpu.core.camera import Camera, camera_frame, generate_camera_rays
