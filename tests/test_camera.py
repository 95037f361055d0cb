import jax.numpy as jnp
import numpy as np

from rvpt_tpu.models import camera as C


def test_pinhole_center_ray():
    cam = C.Camera.create(translation=(1, 2, 3), fov=90.0, aspect=1.0)
    ray = C.generate_rays(cam, jnp.array([0.5]), jnp.array([0.5]))
    assert np.allclose(ray.origin, [[1, 2, 3]], atol=1e-6)
    # center ray looks along +z (the camera's forward axis)
    assert np.allclose(ray.direction, [[0, 0, 1]], atol=1e-6)


def test_pinhole_fov():
    cam = C.Camera.create(fov=90.0, aspect=1.0)
    # film edge x=1 -> u = aspect*(2*1-1) = 1, w = 1/tan(45deg) = 1
    ray = C.generate_rays(cam, jnp.array([1.0]), jnp.array([0.5]))
    d = np.asarray(ray.direction)[0]
    assert np.allclose(d, np.array([1.0, 0.0, 1.0]) / np.sqrt(2), atol=1e-6)


def test_pinhole_yaw_rotation():
    cam = C.Camera.create(rotation=(90.0, 0.0, 0.0), fov=90.0, aspect=1.0)
    ray = C.generate_rays(cam, jnp.array([0.5]), jnp.array([0.5]))
    # yaw 90 about +Y maps +z forward to +x
    assert np.allclose(ray.direction, [[1, 0, 0]], atol=1e-6)


def test_pinhole_pitch_rotation():
    cam = C.Camera.create(rotation=(0.0, 90.0, 0.0), fov=90.0, aspect=1.0)
    ray = C.generate_rays(cam, jnp.array([0.5]), jnp.array([0.5]))
    # pitch 90 about +X maps +z forward to -y... R_x(90): z -> y? verify sign
    d = np.asarray(ray.direction)[0]
    # right-handed R_x(90): (0,0,1) -> (0,-1,0)
    assert np.allclose(d, [0, -1, 0], atol=1e-6)


def test_ortho_rays_parallel():
    cam = C.Camera.create(fov=90.0, scale=2.0, aspect=1.0, mode=C.ORTHO)
    x = jnp.array([0.0, 0.25, 0.5, 1.0])
    y = jnp.array([0.0, 0.5, 0.5, 1.0])
    ray = C.generate_rays(cam, x, y)
    d = np.asarray(ray.direction)
    assert np.allclose(d, d[0:1], atol=1e-6)  # all parallel
    o = np.asarray(ray.origin)
    # center pixel origin = camera translation
    assert np.allclose(o[2], [0, 0, 0], atol=1e-6)
    # scale spreads origins: x=1 -> offset aspect*scale in +x
    assert np.allclose(o[3], [2.0, 2.0, 0.0], atol=1e-5)


def test_spherical_coverage():
    cam = C.Camera.create(mode=C.SPHERICAL)
    # y=0.5 equator: theta=pi/2 -> local dir (cos phi, sin phi, 0) before the
    # reference's .xzy swizzle -> (cos phi, 0, sin phi): x=0 gives +x
    ray = C.generate_rays(cam, jnp.array([0.0, 0.25]), jnp.array([0.5, 0.5]))
    d = np.asarray(ray.direction)
    assert np.allclose(d[0], [1, 0, 0], atol=1e-6)
    assert np.allclose(d[1], [0, 0, 1], atol=1e-6)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)


def test_camera_matrix_differentiable():
    import jax

    def f(tx):
        cam = C.Camera.create(translation=(tx, 0.0, 0.0))
        ray = C.generate_rays(cam, jnp.array([0.5]), jnp.array([0.5]))
        return ray.origin[0, 0]

    assert np.allclose(jax.grad(f)(1.0), 1.0)


def test_soa_raygen_matches_aos():
    import numpy as np

    for mode in (C.PINHOLE, C.ORTHO, C.SPHERICAL):
        cam = C.Camera.create(
            translation=(1, -2, 0.5), rotation=(30, -15, 5), fov=75.0,
            scale=1.7, aspect=1.5, mode=mode,
        )
        r = np.random.default_rng(mode)
        x = jnp.asarray(r.uniform(0, 1, 257), jnp.float32)
        y = jnp.asarray(r.uniform(0, 1, 257), jnp.float32)
        ray = C.generate_rays(cam, x, y)
        ox, oy, oz, dx, dy, dz = C.generate_rays_soa(cam, x, y)
        o2 = np.stack([ox, oy, oz], -1)
        d2 = np.stack([dx, dy, dz], -1)
        assert np.allclose(o2, np.asarray(ray.origin), atol=1e-5), mode
        assert np.allclose(d2, np.asarray(ray.direction), atol=1e-5), mode
