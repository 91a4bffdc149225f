"""Texture atlas + mipmapped sampling + PT integration tests."""
import jax.numpy as jnp
import numpy as np

from fermat_tpu.scene.textures import TextureAtlas
from fermat_tpu.scene.procedural import cornell_box, cornell_camera
from fermat_tpu.render.context import RenderingContext


def checkerboard(n=64, a=1.0, b=0.0):
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    c = ((xx // 8 + yy // 8) % 2).astype(np.float32)
    img = np.where(c[..., None] > 0, a, b) * np.ones((n, n, 3), np.float32)
    return img


class TestAtlas:
    def test_level0_exact(self):
        img = np.zeros((4, 4, 3), np.float32)
        img[0, 0] = [1, 0, 0]
        img[3, 3] = [0, 1, 0]
        atlas = TextureAtlas.build([img])
        t = jnp.zeros(2, jnp.int32)
        # texel centers
        u = jnp.asarray([0.5 / 4, 3.5 / 4])
        v = jnp.asarray([0.5 / 4, 3.5 / 4])
        rgba = atlas.sample(t, u, v)
        np.testing.assert_allclose(np.asarray(rgba[0, :3]), [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(rgba[1, :3]), [0, 1, 0], atol=1e-6)

    def test_top_mip_is_mean(self):
        img = checkerboard(32)
        atlas = TextureAtlas.build([img])
        t = jnp.zeros(1, jnp.int32)
        rgba = atlas.sample(t, jnp.asarray([0.5]), jnp.asarray([0.5]), jnp.asarray([20.0]))
        # 8-bit sources store an RGBA8 mip chain (round 4): the top mip is
        # the mean rounded to the nearest 1/255 step
        np.testing.assert_allclose(np.asarray(rgba[0, :3]), img.mean((0, 1)),
                                   atol=0.51 / 255.0)

    def test_negative_texture_is_white(self):
        atlas = TextureAtlas.build([checkerboard(8)])
        rgba = atlas.sample(jnp.asarray([-1]), jnp.asarray([0.3]), jnp.asarray([0.7]))
        np.testing.assert_allclose(np.asarray(rgba[0]), 1.0)

    def test_bilinear_interpolates(self):
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 0] = 1.0
        atlas = TextureAtlas.build([img])
        # center of the texture: average of 4 texels = 0.25
        rgba = atlas.sample(jnp.zeros(1, jnp.int32), jnp.asarray([0.5]), jnp.asarray([0.5]))
        np.testing.assert_allclose(np.asarray(rgba[0, :3]), 0.25, atol=1e-6)

    def test_multiple_textures_packed(self):
        a = np.full((4, 4, 3), 0.25, np.float32)
        b = np.full((8, 8, 3), 0.75, np.float32)
        atlas = TextureAtlas.build([a, b])
        t = jnp.asarray([0, 1])
        u = jnp.full(2, 0.5)
        rgba = atlas.sample(t, u, u)
        np.testing.assert_allclose(np.asarray(rgba[:, 0]), [0.25, 0.75], atol=1e-6)


class TestTexturedRender:
    def test_textured_cornell(self, tmp_path):
        # give the floor a checkerboard diffuse map
        scene = cornell_box()
        import fermat_tpu.utils.image as im

        tex_file = str(tmp_path / "check.tga")
        im.write_tga(tex_file, checkerboard(64, 1.0, 0.1))
        scene.materials[0].diffuse_map_name = tex_file
        # floor quad needs uvs: give all tris simple planar uvs
        import numpy as np

        T = scene.n_triangles
        scene.uvs = np.asarray([[0, 0], [4, 0], [4, 4], [0, 4]], np.float32)
        tri_uv = np.zeros((T, 3), np.int32)
        tri_uv[0] = [0, 1, 2]
        tri_uv[1] = [0, 2, 3]
        scene.uv_indices = tri_uv
        ctx = RenderingContext.create(
            scene, cornell_camera(), 32, 32, renderer="pt", max_path_length=2
        )
        assert ctx.view.has_textures
        fb = ctx.render(4)
        img = np.asarray(fb.composited)
        assert np.isfinite(img).all()
        # floor shows both bright and dark checker cells
        floor = img[24:, 8:24, 0]
        assert floor.max() > 2.0 * max(floor.min(), 1e-3)


def test_bilinear0_fast_path_matches_generic():
    """The packed 2-gather bilinear0 must match the generic float row
    path exactly (8-bit sources -> both exact) including wrap taps."""
    import numpy as np
    import jax.numpy as jnp
    from fermat_tpu.scene.textures import TextureAtlas

    rng = np.random.default_rng(5)
    imgs = [
        (rng.integers(0, 256, (8, 16, 4)) / 255.0).astype(np.float32),
        (rng.integers(0, 256, (32, 8, 3)) / 255.0).astype(np.float32),
    ]
    at = TextureAtlas.build(imgs)
    assert at.packed is not None and at.packed_q is not None
    n = 512
    tex = jnp.asarray(rng.integers(-1, 2, n), jnp.int32)
    u = jnp.asarray(rng.random(n, np.float32) * 2.0 - 0.5)
    v = jnp.asarray(rng.random(n, np.float32) * 2.0 - 0.5)
    fast = np.asarray(at.sample_bilinear0(tex, u, v))
    generic = np.asarray(
        at._replace(packed=None, packed_q=None).sample_bilinear0(tex, u, v))
    np.testing.assert_allclose(fast, generic, rtol=2e-6, atol=2e-6)


def test_replace_texels_drops_packed_mirror():
    """_replace(texels=...) must invalidate the RGBA8 mirror: a stale
    mirror silently wins over updated texels in every fetch, zeroing
    texture gradients (caught as 3 zero-gradient test failures, round 4).
    Passing new packed taps explicitly keeps them."""
    import numpy as np
    import jax.numpy as jnp
    from fermat_tpu.scene.textures import TextureAtlas

    img = (np.arange(64 * 4).reshape(4, 4, 16)[:, :, :4] % 256 / 255.0
           ).astype(np.float32)
    at = TextureAtlas.build([img])
    assert at.packed is not None
    up = at._replace(texels=at.texels * 0.5)
    assert up.packed is None and up.packed_q is None
    # the update is actually visible to sampling
    tex = jnp.zeros(4, jnp.int32)
    u = v = jnp.asarray([0.1, 0.4, 0.6, 0.9], jnp.float32)
    a = np.asarray(at.sample_bilinear0(tex, u, v))
    b = np.asarray(up.sample_bilinear0(tex, u, v))
    np.testing.assert_allclose(b[:, :3], 0.5 * a[:, :3], rtol=1e-6, atol=1e-6)
    # explicit packed taps are kept
    keep = at._replace(texels=at.texels, packed=at.packed,
                       packed_q=at.packed_q)
    assert keep.packed is not None
