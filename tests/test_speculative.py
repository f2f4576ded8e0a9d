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


class TestBuildTree:
    def test_hand_built_tree(self):
        from sgl_kernel_tpu.ops.speculative import build_tree_kernel_efficient

        # candidates: topk=2, depth=2. Tree: root -> {n1(c0), n2(c1)};
        # n1 -> {n3(c2)}; n2 -> {n4(c3)}
        parent_list = jnp.asarray([[-1, -1, 0, 1]], jnp.int32)  # per candidate
        selected = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
        seq_len = jnp.asarray([10], jnp.int32)
        mask, pos, ridx, nxt, sib = build_tree_kernel_efficient(
            parent_list, selected, seq_len, depth=2, draft_token_num=5
        )
        assert pos.tolist() == [[10, 11, 11, 12, 12]]
        assert ridx.tolist() == [[0, 1, 2, 3, 4]]
        assert nxt.tolist() == [[1, 3, 4, -1, -1]]   # root->n1, n1->n3, n2->n4
        assert sib.tolist() == [[-1, 2, -1, -1, -1]]  # n1's sibling is n2
        m = np.asarray(mask)[0]
        # n3 (idx 3) sees root, n1, itself
        assert m[3].tolist() == [True, True, False, True, False]
        # n4 (idx 4) sees root, n2, itself
        assert m[4].tolist() == [True, False, True, False, True]

    def test_feeds_verify_tree_greedy(self):
        from sgl_kernel_tpu.ops.speculative import (
            build_tree_kernel_efficient, verify_tree_greedy,
        )

        parent_list = jnp.asarray([[-1, -1, 0, 1]], jnp.int32)
        selected = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
        _, _, ridx, nxt, sib = build_tree_kernel_efficient(
            parent_list, selected, jnp.asarray([0], jnp.int32), depth=2, draft_token_num=5
        )
        # tokens at nodes: root=7, n1=3, n2=5, n3=9, n4=2
        candidates = jnp.asarray([[7, 3, 5, 9, 2]], jnp.int32)
        # target greedily predicts 3 after root, 9 after n1, 4 after n3
        target = jnp.asarray([[3, 9, 0, 4, 0]], jnp.int32)
        predicts, accept_index, accept_num = verify_tree_greedy(
            candidates, ridx, nxt, sib, target, num_spec_step=3
        )
        # accepted path: root -> n1 -> n3 (+bonus 4)
        assert accept_num.tolist() == [2]
        assert accept_index.tolist() == [[0, 1, 3]]
