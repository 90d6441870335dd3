"""RVQ + k-means tests: sklearn-parity of predict, residual reconstruction
quality, EMA training convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from open_musiclm_tpu.models.kmeans import (
    kmeans_fit,
    kmeans_inertia,
    kmeans_predict,
    minibatch_kmeans_init,
    minibatch_kmeans_update,
)
from open_musiclm_tpu.models.rvq import (
    rvq_decode,
    rvq_encode,
    rvq_init,
    rvq_quantize,
    rvq_update,
)


def test_kmeans_predict_matches_sklearn():
    from sklearn.cluster import KMeans

    rng = np.random.RandomState(0)
    x = rng.randn(200, 16).astype(np.float32)
    cents = rng.randn(8, 16).astype(np.float32)
    km = KMeans(n_clusters=8, n_init=1)
    km.fit(rng.randn(50, 16))  # fit something, then override centroids
    km.cluster_centers_ = cents.astype(np.float64)
    expected = km.predict(x.astype(np.float64))
    got = np.asarray(kmeans_predict(jnp.asarray(x), jnp.asarray(cents)))
    assert (expected == got).mean() > 0.99  # float assoc may flip exact ties


def test_kmeans_fit_reduces_inertia():
    key = jax.random.PRNGKey(0)
    centers = jax.random.normal(key, (8, 4)) * 5
    pts = centers[jax.random.randint(key, (500,), 0, 8)] + 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (500, 4)
    )
    cents = kmeans_fit(pts, 8, jax.random.PRNGKey(2), num_iters=20)
    inertia = float(kmeans_inertia(pts, cents))
    assert inertia < 0.5  # near the 0.04*4 noise floor


def test_minibatch_kmeans_converges():
    key = jax.random.PRNGKey(0)
    centers = jax.random.normal(key, (4, 8)) * 3
    data = centers[jax.random.randint(key, (2000,), 0, 4)] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(1), (2000, 8)
    )
    state = minibatch_kmeans_init(data[:100], 4, jax.random.PRNGKey(2))
    for i in range(20):
        state = minibatch_kmeans_update(state, data[i * 100 : (i + 1) * 100])
    assert float(kmeans_inertia(data, state.centroids)) < 0.5


def test_rvq_encode_decode_shapes():
    state = rvq_init(num_quantizers=4, codebook_size=32, dim=16, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 16))
    idx = rvq_encode(state, x)
    assert idx.shape == (10, 4)
    rec = rvq_decode(state, idx)
    assert rec.shape == (10, 16)


def test_rvq_residual_refinement():
    """Each extra quantizer must reduce reconstruction error (after training)."""
    key = jax.random.PRNGKey(0)
    state = rvq_init(num_quantizers=4, codebook_size=64, dim=8, key=key)
    data = jax.random.normal(jax.random.PRNGKey(1), (512, 8))
    for i in range(30):
        batch = jax.random.normal(jax.random.PRNGKey(2 + i), (512, 8))
        state, _, _ = rvq_update(state, batch, jax.random.fold_in(key, i))

    x = jax.random.normal(jax.random.PRNGKey(99), (256, 8))
    errs = []
    for q in range(1, 5):
        sub = state._replace(
            codebooks=state.codebooks[:q],
            cluster_size=state.cluster_size[:q],
            embed_avg=state.embed_avg[:q],
        )
        quant, _ = rvq_quantize(sub, x)
        errs.append(float(jnp.mean(jnp.square(quant - x))))
    assert errs[1] < errs[0] and errs[2] < errs[1] and errs[3] < errs[2]
    assert errs[-1] < 0.6 * errs[0]


def test_rvq_update_is_jittable_and_improves():
    key = jax.random.PRNGKey(0)
    state = rvq_init(num_quantizers=2, codebook_size=16, dim=4, key=key)
    upd = jax.jit(lambda s, x, k: rvq_update(s, x, k, threshold_ema_dead_code=0.5))
    data = jax.random.normal(jax.random.PRNGKey(5), (256, 4))
    state, q0, _ = upd(state, data, jax.random.PRNGKey(6))
    err0 = float(jnp.mean(jnp.square(q0 - data)))
    for i in range(20):
        state, q, _ = upd(state, data, jax.random.fold_in(key, i))
    err1 = float(jnp.mean(jnp.square(q - data)))
    assert err1 <= err0 + 1e-6
