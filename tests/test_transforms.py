import jax
import jax.numpy as jnp
import numpy as np
import scipy.spatial.transform as sst

from gslam_tpu.core import (
    matrix_to_quaternion,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
    se3_exp,
    so3_exp,
    so3_log,
    identity_pose_delta,
    pose_matrix,
)
from gslam_tpu.core.transforms import invert_se3, rebase_pose, PoseDelta


def random_rotations(rng, n):
    return sst.Rotation.random(n, random_state=rng).as_matrix().astype(np.float32)


def test_quat_roundtrip(rng):
    R = random_rotations(rng, 64)
    q = matrix_to_quaternion(jnp.asarray(R))
    R2 = quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    # w >= 0 convention
    assert np.all(np.asarray(q)[:, 0] >= 0)


def test_quat_matches_scipy(rng):
    R = random_rotations(rng, 16)
    q = np.asarray(matrix_to_quaternion(jnp.asarray(R)))
    q_ref = sst.Rotation.from_matrix(R).as_quat()  # xyzw
    q_ref = np.concatenate([q_ref[:, 3:4], q_ref[:, :3]], axis=1)
    q_ref = np.where(q_ref[:, :1] < 0, -q_ref, q_ref)
    np.testing.assert_allclose(np.abs(q), np.abs(q_ref), atol=1e-5)


def test_rotation_6d_identity():
    d6 = jnp.array([1.0, 0, 0, 0, 1.0, 0])
    np.testing.assert_allclose(np.asarray(rotation_6d_to_matrix(d6)), np.eye(3), atol=1e-6)


def test_rotation_6d_orthonormal(rng):
    d6 = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
    R = np.asarray(rotation_6d_to_matrix(d6))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_rotation_6d_recovers_rotation(rng):
    # Feeding the first two rows of a rotation matrix recovers it.
    R = random_rotations(rng, 8)
    d6 = jnp.asarray(R[:, :2, :].reshape(8, 6))
    R2 = np.asarray(rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(32, 3)).astype(np.float32) * 0.8
    R = so3_exp(jnp.asarray(w))
    w2 = so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)


def test_so3_exp_matches_scipy(rng):
    w = rng.normal(size=(8, 3)).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray(w)))
    R_ref = sst.Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_grad_at_zero():
    g = jax.grad(lambda w: so3_exp(w)[0, 1])(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_identity():
    np.testing.assert_allclose(np.asarray(se3_exp(jnp.zeros(6))), np.eye(4), atol=1e-6)


def test_se3_exp_pure_translation():
    xi = jnp.array([1.0, 2.0, 3.0, 0, 0, 0])
    T = np.asarray(se3_exp(xi))
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_invert_se3(rng):
    R = random_rotations(rng, 4)
    t = rng.normal(size=(4, 3)).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = t
    Tinv = np.asarray(invert_se3(jnp.asarray(T)))
    prod = np.einsum("bij,bjk->bik", T, Tinv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)


def test_pose_delta_identity(rng):
    base = np.eye(4, dtype=np.float32)
    base[:3, 3] = [1, 2, 3]
    p = identity_pose_delta(jnp.asarray(base))
    np.testing.assert_allclose(np.asarray(pose_matrix(p)), base, atol=1e-6)


def test_pose_delta_composition(rng):
    base = np.eye(4, dtype=np.float32)
    base[:3, :3] = random_rotations(rng, 1)[0]
    base[:3, 3] = rng.normal(size=3)
    p = identity_pose_delta(jnp.asarray(base))
    p = PoseDelta(p.base, p.d_rot6, p.d_t + jnp.array([0.1, 0.0, 0.0]))
    # base @ delta: delta translation is applied in the base frame
    expected_t = base[:3, :3] @ np.array([0.1, 0, 0]) + base[:3, 3]
    np.testing.assert_allclose(np.asarray(pose_matrix(p))[:3, 3], expected_t, atol=1e-5)


def test_rebase_pose(rng):
    base = np.eye(4, dtype=np.float32)
    base[:3, :3] = random_rotations(rng, 1)[0]
    p = PoseDelta(
        jnp.asarray(base),
        jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=3).astype(np.float32) * 0.1),
    )
    m1 = np.asarray(pose_matrix(p))
    p2 = rebase_pose(p)
    np.testing.assert_allclose(np.asarray(pose_matrix(p2)), m1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2.d_t), np.zeros(3), atol=1e-6)


def test_pose_grad_flows():
    p = identity_pose_delta()

    def loss(d_rot6, d_t):
        m = pose_matrix(PoseDelta(p.base, d_rot6, d_t))
        return jnp.sum(m[:3, 3] ** 2) + m[0, 1] ** 2

    g = jax.grad(loss, argnums=(0, 1))(p.d_rot6, p.d_t)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in g)
