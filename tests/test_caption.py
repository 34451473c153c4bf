"""Caption metrics golden tests + beam search behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betrayed_by_captions_tpu.evaluation.caption_metrics import (
    bleu_score,
    cider_d_score,
    evaluate_captions,
    rouge_l_score,
)
from betrayed_by_captions_tpu.evaluation.inference import beam_search


class TestBleu:
    def test_perfect_match(self):
        c = {"1": "a dog sits on the bench"}
        r = {"1": ["a dog sits on the bench"]}
        scores = bleu_score(c, r)
        for s in scores:
            assert s == pytest.approx(1.0)

    def test_no_overlap(self):
        c = {"1": "xyz qrs tuv"}
        r = {"1": ["a dog sits"]}
        scores = bleu_score(c, r)
        assert scores[0] < 1e-6

    def test_partial_unigram(self):
        c = {"1": "the dog"}
        r = {"1": ["a dog runs"]}
        scores = bleu_score(c, r)
        # 1 of 2 unigrams match; BP = exp(1 - 3/2)
        import math

        assert scores[0] == pytest.approx(0.5 * math.exp(1 - 3 / 2), rel=1e-6)

    def test_clipping(self):
        c = {"1": "dog dog dog"}
        r = {"1": ["one dog here"]}
        scores = bleu_score(c, r)
        assert scores[0] == pytest.approx(1 / 3, rel=1e-6)


class TestCiderRouge:
    def test_perfect_cider_positive(self):
        c = {"1": "a dog on a bench", "2": "a cat on a mat"}
        r = {"1": ["a dog on a bench"], "2": ["a cat on a mat"]}
        score = cider_d_score(c, r)
        assert score > 1.0  # perfect matches score high (max 10)

    def test_cider_orders_quality(self):
        r = {"1": ["a dog on a bench"], "2": ["two people walk"]}
        good = {"1": "a dog on a bench", "2": "two people walk"}
        bad = {"1": "purple elephants fly", "2": "quantum flux"}
        assert cider_d_score(good, r) > cider_d_score(bad, r)

    def test_rouge_perfect(self):
        c = {"1": "a dog sits"}
        r = {"1": ["a dog sits"]}
        assert rouge_l_score(c, r) == pytest.approx(1.0)

    def test_rouge_subsequence(self):
        c = {"1": "a dog"}
        r = {"1": ["a big dog"]}
        score = rouge_l_score(c, r)
        # LCS=2: p=1, r=2/3 -> F(beta=1.2)
        beta = 1.2
        p, rc = 1.0, 2 / 3
        want = (1 + beta**2) * p * rc / (rc + beta**2 * p)
        assert score == pytest.approx(want, rel=1e-6)

    def test_evaluate_all_keys(self):
        c = {"1": "a dog"}
        r = {"1": ["a dog"]}
        m = evaluate_captions(c, r)
        assert set(m) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "CIDEr", "ROUGE_L"}


class TestBeamSearch:
    def test_greedy_sequence_recovered(self):
        """A deterministic scorer that always prefers a fixed next token
        must yield that sequence."""
        vocab = 20
        eos = 5
        preferred = [7, 9, 11, eos]

        def scorer(ids, memory):
            t = ids.shape[1]
            step = t - 1  # 0-based next position
            logits = np.full((ids.shape[0], vocab), -10.0, np.float32)
            tok = preferred[min(step, len(preferred) - 1)]
            logits[:, tok] = 0.0
            return jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))

        memory = jnp.zeros((1, 4, 8))
        finished = beam_search(
            scorer, memory, beam_width=3, max_len=10, bos=1, eos=eos
        )
        assert finished, "no finished sequences"
        best = finished[0][0]
        assert best == [1, 7, 9, 11, eos]

    def test_max_len_terminates(self):
        vocab = 10

        def scorer(ids, memory):
            logits = np.zeros((ids.shape[0], vocab), np.float32)
            logits[:, 3] = 5.0  # never EOS
            return jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))

        finished = beam_search(
            scorer, jnp.zeros((1, 2, 4)), beam_width=2, max_len=6, bos=1, eos=0
        )
        # nothing can finish; search must still terminate
        assert finished == [] or all(len(s) <= 6 for s, _ in finished)


class TestJitBeamSearch:
    """Fixed-shape fully-jitted beam search (evaluation/inference.py):
    one compile, full-depth search; its best normalized score must be >=
    the host loop's (which stops early once beam_width finish)."""

    def _tiny(self):
        import numpy as np

        from betrayed_by_captions_tpu.evaluation.inference import (
            make_caption_scorer,
            make_jit_beam_search,
        )
        from betrayed_by_captions_tpu.models.bert import (
            BertWordEmbeddings,
            synthetic_bert_assets,
        )
        from betrayed_by_captions_tpu.models.detector import Mask2FormerOpen

        vocab, emb = 50, 16
        model = Mask2FormerOpen(
            num_classes=5,
            num_queries=4,
            feat_channels=32,
            emb_dim=emb,
            num_decoder_layers=2,
            caption_num_layers=2,
            use_caption_generation=True,
            vocab_size=vocab,
            max_caption_len=12,
        )
        import jax

        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 32, 32, 3)),
            method="init_forward",
        )["params"]
        bert = BertWordEmbeddings(synthetic_bert_assets(vocab, emb))
        return model, params, bert

    def test_greedy_sequence_recovered(self):
        """Deterministic scorer preferring a fixed token chain: the jitted
        search must recover exactly the host search's sequence."""
        import jax

        from betrayed_by_captions_tpu.evaluation.inference import (
            jit_beam_search_from_logits,
        )

        vocab, eos, bos = 20, 5, 1
        preferred = [7, 9, 11, eos]

        def logits_at(ids, memory_w, pos):
            step = jnp.minimum(pos, len(preferred) - 1)
            tok = jnp.asarray(preferred, jnp.int32)[step]
            logits = jnp.full((ids.shape[0], vocab), -10.0, jnp.float32)
            logits = logits.at[:, tok].set(0.0)
            return jax.nn.log_softmax(logits, axis=-1)

        jit_fn = jit_beam_search_from_logits(
            logits_at, beam_width=3, max_len=10, alpha=0.7, bos=bos, eos=eos
        )
        fin_ids, fin_scores = jit_fn(jnp.zeros((1, 4, 8)))
        best = int(np.argmax(np.asarray(fin_scores)))
        assert float(fin_scores[best]) > -1e20
        seq = list(np.asarray(fin_ids[best][:5]))
        assert seq == [1, 7, 9, 11, eos]

    @pytest.mark.slow  # jitted fixed-shape search compile, ~60 s on CPU
    def test_matches_or_beats_host_search(self):
        """On a real tiny model, if the host loop finds any hypothesis the
        jitted full-depth search must score at least as well."""
        import jax

        from betrayed_by_captions_tpu.evaluation.inference import (
            beam_search,
            make_caption_scorer,
            make_jit_beam_search,
        )

        model, params, bert = self._tiny()
        memory = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 16))

        bos, eos, width, max_len = 1, 2, 3, 10
        host = beam_search(
            make_caption_scorer(model, params, bert),
            memory,
            beam_width=width,
            max_len=max_len,
            bos=bos,
            eos=eos,
        )
        jit_fn = make_jit_beam_search(
            model, params, bert, beam_width=width, max_len=max_len,
            alpha=0.7, bos=bos, eos=eos,
        )
        fin_ids, fin_scores = jit_fn(memory)
        fin_scores = np.asarray(fin_scores)

        if host:
            best = fin_scores.argmax()
            assert fin_scores[best] > -1e20, "host finished but jit did not"
            assert fin_scores[best] >= host[0][1] - 1e-4

    def test_single_compile(self):
        import jax

        from betrayed_by_captions_tpu.evaluation.inference import (
            make_jit_beam_search,
        )

        model, params, bert = self._tiny()
        jit_fn = make_jit_beam_search(
            model, params, bert, beam_width=3, max_len=10, bos=1, eos=2
        )
        m1 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16))
        m2 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16))
        jit_fn(m1)
        with jax.log_compiles():
            import logging

            jit_fn(m2)  # same shapes: must not retrace
        assert jit_fn._cache_size() == 1


class TestBeamReferenceStoppingParity:
    """Parity guard vs the REFERENCE beam-search stopping rule (VERDICT
    round-1 item 10; reference open_set/utils/eval/inference.py:84-159):
    the reference stops collecting once `beam_width` hypotheses finish,
    while the jitted search runs full depth and keeps the best finished.
    On deterministic Markov scorers the jit top-1 must score >= the
    reference top-1 (superset of hypotheses), and in practice match it
    exactly. This test also caught a real off-by-one in the jit length
    normalization ((t+1)^alpha for a length-(t+2) candidate)."""

    V, BOS, EOS, W, T, ALPHA = 12, 1, 2, 3, 10, 0.7

    def _table(self, seed):
        rs = np.random.RandomState(seed)
        logits = rs.randn(self.V, self.V) * 2.0
        logits[:, self.EOS] += 1.0  # bias toward finishing
        return (
            logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        ).astype(np.float32)

    def _reference_beam(self, table):
        """The reference algorithm verbatim-in-spirit: candidate weights,
        early stop at W finished, normalize by len(seq)**alpha."""
        width, max_len, alpha = self.W, self.T, self.ALPHA
        bos, eos = self.BOS, self.EOS
        logp0 = table[bos]
        top = np.argsort(-logp0)[:width]
        sequences = [[bos, int(t)] for t in top]
        weights = [float(logp0[t]) for t in top]
        finished = []
        while sequences:
            t = len(sequences[0])
            lp = np.stack([table[s[-1]] for s in sequences])
            cumulative = lp + np.asarray(weights)[:, None]
            normalized = cumulative / (t + 1) ** alpha
            top = np.argsort(-normalized.reshape(-1))[:width]
            new_sequences, new_weights = [], []
            stop = False
            for pos in top:
                row, col = int(pos // self.V), int(pos % self.V)
                seq = sequences[row] + [col]
                cand_weight = float(cumulative[row, col])
                if col == eos:
                    finished.append((seq, cand_weight / len(seq) ** alpha))
                    if len(finished) >= width:
                        stop = True
                        break
                elif len(seq) < max_len - 1:
                    new_sequences.append(seq)
                    new_weights.append(cand_weight)
            if stop or not new_sequences:
                break
            sequences, weights = new_sequences, new_weights
        finished.sort(key=lambda x: -x[1])
        return finished

    def _jit_from_table(self, table):
        import jax

        from betrayed_by_captions_tpu.evaluation.inference import (
            jit_beam_search_from_logits,
        )

        tab = jnp.asarray(table)

        def logits_at(ids, memory_w, pos):
            last = jax.lax.dynamic_slice_in_dim(ids, pos, 1, axis=1)[:, 0]
            return jnp.take(tab, last, axis=0)

        return jit_beam_search_from_logits(
            logits_at, beam_width=self.W, max_len=self.T,
            alpha=self.ALPHA, bos=self.BOS, eos=self.EOS,
        )

    def test_top1_score_parity(self):
        agree_seq, total = 0, 0
        for seed in range(12):
            table = self._table(seed)
            ref = self._reference_beam(table)
            fin_ids, fin_scores = self._jit_from_table(table)(
                jnp.zeros((1, 2, 4))
            )
            fin_scores = np.asarray(fin_scores)
            best = int(fin_scores.argmax())
            jit_found = float(fin_scores[best]) > -1e20
            if not ref:
                # both searches must agree that nothing finishes
                assert not jit_found, seed
                continue
            assert jit_found, seed
            ref_seq, ref_score = ref[0]
            # full-depth search keeps a superset of hypotheses: >= always,
            # == in practice (Markov scorers admit no late improvements
            # under consistent length normalization)
            assert fin_scores[best] >= ref_score - 1e-4, seed
            np.testing.assert_allclose(
                fin_scores[best], ref_score, atol=1e-4,
                err_msg=f"seed {seed}",
            )
            jit_seq = [self.BOS]
            for tok in np.asarray(fin_ids[best])[1:]:
                jit_seq.append(int(tok))
                if tok == self.EOS:
                    break
            # sequence comparison is only meaningful when the reference
            # top-1 finished at its FIRST EOS (the first-step expansion
            # admits EOS as an ordinary token in both searches, and the
            # truncating decode then cuts equal-scored hypotheses
            # differently)
            if self.EOS not in ref_seq[1:-1]:
                total += 1
                agree_seq += jit_seq == ref_seq
        assert total >= 3, "scorers too EOS-shy; raise the bias"
        # clean sequences may differ only on exact score ties
        assert agree_seq >= total - 1, (agree_seq, total)


class TestCaptionEvalProtocol:
    def test_cap_results_through_dataset_evaluate(self, tmp_path):
        """eval_type 'cap_results' routes generated sentences through the
        caption metrics (reference coco_open.py:745-781)."""
        import json as _json

        import cv2

        from betrayed_by_captions_tpu.data.coco import CocoDatasetOpen

        root = tmp_path
        images, anns, caps = [], [], []
        for i in range(3):
            img = np.zeros((32, 32, 3), np.uint8)
            cv2.imwrite(str(root / f"i{i}.jpg"), img)
            images.append(
                {"id": i + 1, "file_name": f"i{i}.jpg", "height": 32, "width": 32}
            )
            caps.append(
                {"id": 10 + i, "image_id": i + 1, "caption": "a cat on a mat"}
            )
        with open(root / "inst.json", "w") as f:
            _json.dump(
                {
                    "images": images,
                    "annotations": [],
                    "categories": [{"id": 1, "name": "cat"}],
                },
                f,
            )
        with open(root / "caps.json", "w") as f:
            _json.dump({"images": images, "annotations": caps}, f)

        ds = CocoDatasetOpen(
            str(root / "inst.json"),
            img_prefix=str(root),
            caption_ann_file=str(root / "caps.json"),
            test_mode=True,
            filter_empty_gt=False,
        )
        out = ds.evaluate(
            {"cap_results": ["a cat on a mat", "a cat", "a dog in a fog"]},
            {"cap_results": None},
            metrics=(),
        )
        assert out["cap_results.Bleu_1"] > 0.5
        assert out["cap_results.CIDEr"] >= 0.0
        assert out["cap_results.ROUGE_L"] > 0.3

    def test_embedding_dump(self, tmp_path):
        import json as _json

        import cv2

        from betrayed_by_captions_tpu.data.coco import CocoDatasetOpen

        root = tmp_path
        img = np.zeros((16, 16, 3), np.uint8)
        cv2.imwrite(str(root / "i0.jpg"), img)
        with open(root / "inst.json", "w") as f:
            _json.dump(
                {
                    "images": [
                        {"id": 1, "file_name": "i0.jpg", "height": 16, "width": 16}
                    ],
                    "annotations": [],
                    "categories": [{"id": 7, "name": "cat"}],
                },
                f,
            )
        ds = CocoDatasetOpen(
            str(root / "inst.json"), img_prefix=str(root), test_mode=True,
            filter_empty_gt=False,
        )
        embs = np.random.RandomState(0).randn(4, 8).astype(np.float32)
        labels = np.array([0, 1, 0, 0])  # label 1 == num classes -> skipped
        ds.save_embedding_results(
            [(embs, labels)], dump_dir=str(root / "results")
        )
        saved = np.load(root / "results" / "coco_embedding.npy")
        cats = np.load(root / "results" / "coco_gt_category.npy")
        assert saved.shape == (3, 8)
        assert list(cats) == [7, 7, 7]
