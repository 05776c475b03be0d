"""Pallas bucket-histogram vs numpy bincount."""
import numpy as np
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.ops.histogram import bucket_histogram


class TestBucketHistogram:
    def test_matches_bincount(self):
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 544, 10000, dtype=np.int32)
        got = np.asarray(bucket_histogram(jnp.asarray(ids), 544,
                                          interpret=True))
        want = np.bincount(ids, minlength=544)
        np.testing.assert_array_equal(got, want)

    def test_out_of_range_ignored(self):
        ids = jnp.asarray([0, 1, 1, 544, 600, -1, 2], jnp.int32)
        got = np.asarray(bucket_histogram(ids, 544, interpret=True))
        assert got[0] == 1 and got[1] == 2 and got[2] == 1
        assert got.sum() == 4

    def test_non_block_multiple_length(self):
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 100, 3001, dtype=np.int32)
        got = np.asarray(bucket_histogram(jnp.asarray(ids), 100,
                                          interpret=True))
        np.testing.assert_array_equal(got, np.bincount(ids, minlength=100))

    def test_multi_chunk_bucket_axis(self):
        """More buckets than one grid chunk (BCHUNK=1024): chunk c writes
        COLUMN block c of the 1-row output — regression for the (c, 0)
        block-index bug that corrupted every tile-range computation with
        > 1024 buckets (e.g. 16-px tiles at 960x544 = 2040 tiles)."""
        rng = np.random.default_rng(2)
        nb = 2040
        ids = rng.integers(0, nb, 50000, dtype=np.int32)
        got = np.asarray(bucket_histogram(jnp.asarray(ids), nb,
                                          interpret=True))
        np.testing.assert_array_equal(got, np.bincount(ids, minlength=nb))

    def test_three_chunk_bucket_axis(self):
        rng = np.random.default_rng(3)
        nb = 2500
        ids = rng.integers(-5, nb + 7, 20000, dtype=np.int32)
        got = np.asarray(bucket_histogram(jnp.asarray(ids), nb,
                                          interpret=True))
        want = np.bincount(np.clip(ids, 0, nb)[(ids >= 0) & (ids < nb)],
                           minlength=nb)
        np.testing.assert_array_equal(got, want)
