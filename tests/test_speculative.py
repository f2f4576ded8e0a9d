"""Speculative decoding tests — golden values from the reference's
tests/speculative/test_eagle_utils.py and test_speculative_sampling.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_tpu.ops import speculative


@pytest.fixture
def tree():
    candidates = jnp.asarray([[0, 1, 2, 3, 4, 5], [7, 8, 9, 10, 11, 12]], jnp.int32)
    retrive_index = jnp.asarray([[0, 1, 2, 3, 4, 5], [6, 7, 8, 9, 10, 11]], jnp.int32)
    retrive_next_token = jnp.asarray([[1, 2, -1, 4, 5, -1], [4, 2, 3, -1, 5, -1]], jnp.int32)
    retrive_next_sibling = jnp.asarray([[-1, 3, -1, -1, -1, -1], [-1, -1, -1, -1, 1, -1]], jnp.int32)
    target_logits = np.full((2, 6, 20), 1.0, np.float32)
    target_logits[0, 0, 3] = 10
    target_logits[0, 3, 4] = 10
    target_logits[0, 4, 5] = 10
    target_logits[1, 0, 11] = 10
    target_logits[1, 4, 12] = 10
    for i in range(2):
        for j in range(6):
            if target_logits[i, j].max() < 10:
                target_logits[i, j, 18] = 10
    return candidates, retrive_index, retrive_next_token, retrive_next_sibling, target_logits


class TestVerifyTreeGreedy:
    def test_golden(self, tree):
        cand, ridx, rnt, rns, logits = tree
        target_predict = jnp.asarray(logits.argmax(-1), jnp.int32)
        predicts, accept_index, accept_num = speculative.verify_tree_greedy(
            cand, ridx, rnt, rns, target_predict, num_spec_step=4
        )
        assert np.asarray(predicts).tolist() == [3, -1, -1, 4, 5, 18, 11, -1, -1, -1, 12, 18]
        assert np.asarray(accept_index).tolist() == [[0, 3, 4, 5], [6, 10, 11, -1]]
        assert np.asarray(accept_num).tolist() == [3, 2]


class TestTreeSampling:
    @pytest.mark.parametrize(
        "ts,ta,exp_predicts,exp_accept,exp_num",
        [
            (1.0, 1.0, [3, -1, -1, 4, 5, 18, 11, -1, -1, -1, 12, 18], [[0, 3, 4, 5], [6, 10, 11, -1]], [3, 2]),
            (0.0, 0.0, [1, 2, 18, -1, -1, -1, 11, -1, -1, -1, 12, 18], [[0, 1, 2, -1], [6, 10, 11, -1]], [2, 2]),
        ],
    )
    def test_golden(self, tree, ts, ta, exp_predicts, exp_accept, exp_num):
        cand, ridx, rnt, rns, logits = tree
        temperature = 0.01
        probs = jax.nn.softmax(jnp.asarray(logits) / temperature, axis=-1)
        draft_probs = jnp.zeros_like(probs)
        coins = jnp.zeros((2, 6), jnp.float32)
        predicts, accept_index, accept_num = speculative.tree_speculative_sampling_target_only(
            cand, ridx, rnt, rns, coins, probs, draft_probs,
            num_spec_step=4, threshold_single=ts, threshold_acc=ta, deterministic=True,
        )
        assert np.asarray(predicts).tolist() == exp_predicts
        assert np.asarray(accept_index).tolist() == exp_accept
        assert np.asarray(accept_num).tolist() == exp_num


class TestSegmentPackbits:
    def test_basic(self):
        # two segments: 10 bits + 3 bits -> 2 bytes + 1 byte
        x = jnp.asarray([1, 0, 1, 1, 0, 0, 0, 1, 1, 1, 1, 0, 1], jnp.int32)
        input_indptr = jnp.asarray([0, 10, 13], jnp.int32)
        output_indptr = jnp.asarray([0, 2, 3], jnp.int32)
        out = speculative.segment_packbits(x, input_indptr, output_indptr, out_size=3)
        seg0 = x[:10]
        b0 = sum(int(seg0[i]) << i for i in range(8))
        b1 = sum(int(seg0[8 + i]) << i for i in range(2))
        seg1 = x[10:]
        b2 = sum(int(seg1[i]) << i for i in range(3))
        assert np.asarray(out).tolist() == [b0, b1, b2]
