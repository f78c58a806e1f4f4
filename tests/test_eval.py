"""Scoring / DET / tools tests with constructed posteriors."""

import json

import numpy as np

from wekws_tpu.eval import (
    compute_det,
    frr_at_fa_per_hour,
    load_label_and_score,
    write_score_file,
    write_stats_file,
)
from wekws_tpu.eval.det_ctc import compute_det_ctc, load_label_and_score_ctc
from wekws_tpu.eval.score_ctc import (
    build_keywords_token,
    detect_keyword,
    write_ctc_score_file,
)
from wekws_tpu.decode import ctc_prefix_beam_search
from wekws_tpu.tools import compute_cmvn_stats, make_list, wav_durations


def fake_dataset(n_batches=2, b=3, t=20, k=2, seed=0):
    rng = np.random.default_rng(seed)
    for bi in range(n_batches):
        yield {
            "keys": [f"utt{bi}_{i}" for i in range(b)],
            "probs": rng.uniform(0, 1, (b, t, k)).astype(np.float32),
            "lengths": np.full((b,), t, np.int32),
        }


class TestScoreDet:
    def make_files(self, tmp_path):
        # 2 keyword utts (peaks .9/.4), 2 fillers (peaks .6/.2), 100s each
        score = tmp_path / "score.txt"
        lines = []
        lines.append("kw1 <KW> 0.1 0.9 0.1")
        lines.append("kw2 <KW> 0.1 0.4 0.1")
        lines.append("f1 <KW> 0.6 0.1 0.1")
        lines.append("f2 <KW> 0.2 0.1 0.2")
        score.write_text("\n".join(lines) + "\n")
        label = tmp_path / "data.list"
        rows = [
            {"key": "kw1", "txt": "<kw>", "duration": 100.0},
            {"key": "kw2", "txt": "<kw>", "duration": 100.0},
            {"key": "f1", "txt": "other", "duration": 100.0},
            {"key": "f2", "txt": "other", "duration": 100.0},
        ]
        label.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        return str(label), str(score)

    def test_load_and_sweep(self, tmp_path):
        label, score = self.make_files(tmp_path)
        kw_table, filler_table, filler_dur = load_label_and_score(
            "<KW>", label, score
        )
        assert set(kw_table) == {"kw1", "kw2"}
        assert set(filler_table) == {"f1", "f2"}
        assert filler_dur == 200.0
        results = compute_det(kw_table, filler_table, filler_dur, step=0.1)
        # threshold 0.5: kw2 (max .4) rejected -> FRR 0.5;
        # fillers: only f1 (.6) fires -> FA/h = 1 / (200/3600) = 18
        row = results[5]
        assert abs(row[0] - 0.5) < 1e-9
        assert abs(row[2] - 0.5) < 1e-9
        assert abs(row[1] - 18.0) < 1e-6
        # monotonic FRR in threshold
        frrs = [r[2] for r in results]
        assert all(a <= b + 1e-9 for a, b in zip(frrs, frrs[1:]))

        stats = tmp_path / "stats.txt"
        write_stats_file(results, str(stats))
        assert len(stats.read_text().splitlines()) == len(results)

        assert frr_at_fa_per_hour(results, 20.0) <= 0.5
        assert frr_at_fa_per_hour(results, 1e-9) == 1.0

    def test_write_score_file(self, tmp_path):
        def forward(batch):
            return batch["probs"], batch["lengths"]

        out = tmp_path / "score.txt"
        n = write_score_file(
            forward, fake_dataset(), ["<A>", "<B>"], str(out)
        )
        assert n == 6
        lines = out.read_text().splitlines()
        assert len(lines) == 12  # per utt per keyword
        parts = lines[0].split()
        assert parts[1] == "<A>" and len(parts) == 2 + 20


class FakeTokenizer:
    table = {"<blk>": 0, "h": 1, "i": 2, "x": 3}

    def tokenize(self, text):
        toks = [c for c in text if c in self.table and c != " "]
        return toks, [self.table[c] for c in toks]


class TestCtcScoring:
    def test_detect_keyword_from_beam(self):
        # posteriors spelling h-i with blanks
        v = 5
        frames = [0, 1, 0, 2, 0]
        probs = np.full((len(frames), v), 0.02, np.float32)
        for t, s in enumerate(frames):
            probs[t] = 0.02
            probs[t, s] = 0.92
        kw_token, idxset = build_keywords_token(["hi"], FakeTokenizer())
        assert kw_token["hi"]["token_id"] == (1, 2)
        hyps = ctc_prefix_beam_search(probs, None, idxset)
        hit = detect_keyword(hyps, kw_token)
        assert hit is not None
        word, score, start, end = hit
        assert word == "hi"
        assert 0.8 < score <= 1.0
        assert start == 1 and end == 3

    def test_write_ctc_score_and_det(self, tmp_path):
        v = 5
        kw_token, idxset = build_keywords_token(["hi"], FakeTokenizer())

        def make_probs(seq):
            p = np.full((len(seq), v), 0.02, np.float32)
            for t, s in enumerate(seq):
                p[t, s] = 0.92
            return p

        batches = [{
            "keys": ["pos", "neg"],
            "probs": np.stack(
                [make_probs([0, 1, 0, 2, 0]), make_probs([0, 3, 0, 3, 0])]
            ),
            "lengths": np.array([5, 5], np.int32),
        }]

        def forward(batch):
            return batch["probs"], batch["lengths"]

        score = tmp_path / "ctc_score.txt"
        n = write_ctc_score_file(
            forward, batches, kw_token, idxset, str(score)
        )
        assert n == 2
        lines = score.read_text().splitlines()
        assert lines[0].startswith("pos detected hi")
        assert lines[1] == "neg rejected"

        label = tmp_path / "data.list"
        rows = [
            {"key": "pos", "txt": "hi", "duration": 10.0, "wav": "x"},
            {"key": "neg", "txt": "xx", "duration": 10.0, "wav": "x"},
        ]
        label.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        table = load_label_and_score_ctc(["hi"], str(label), str(score))
        entry = table["hi"]
        assert len(entry["keyword_table"]) == 1
        assert len(entry["filler_table"]) == 1
        results = compute_det_ctc(entry, step=0.1)
        # at low threshold: pos detected (no FR), neg not detected (no FA)
        assert results[1][2] == 0.0


class TestTools:
    def test_make_list_and_durations(self, tmp_path, rng):
        from wekws_tpu.data.audio import write_wav

        wavs = {}
        for key in ["a", "b"]:
            p = tmp_path / f"{key}.wav"
            write_wav(
                str(p),
                rng.standard_normal(8000).astype(np.float32) * 0.1,
                16000,
            )
            wavs[key] = str(p)
        scp = tmp_path / "wav.scp"
        scp.write_text("".join(f"{k} {v}\n" for k, v in wavs.items()))
        text = tmp_path / "text"
        text.write_text("a hello\nb 1\n")
        durs = wav_durations(
            [(k, v) for k, v in wavs.items()], str(tmp_path / "wav.dur")
        )
        assert abs(durs["a"] - 0.5) < 1e-6
        out = tmp_path / "data.list"
        n = make_list(str(scp), str(text), str(tmp_path / "wav.dur"), str(out))
        assert n == 2
        rows = [json.loads(ln) for ln in out.read_text().splitlines()]
        assert rows[0]["key"] == "a" and rows[0]["txt"] == "hello"
        assert abs(rows[0]["duration"] - 0.5) < 1e-6

    def test_cmvn_stats_normalizes(self, tmp_path, rng):
        from wekws_tpu.data.audio import write_wav
        from wekws_tpu.frontend.cmvn import load_cmvn

        paths = []
        for i in range(3):
            p = tmp_path / f"{i}.wav"
            write_wav(
                str(p),
                rng.standard_normal(16000).astype(np.float32) * 0.1,
                16000,
            )
            paths.append(str(p))
        conf = {
            "feats_type": "fbank",
            "fbank_conf": {"num_mel_bins": 23, "frame_shift": 10,
                           "frame_length": 25},
        }
        out = tmp_path / "global_cmvn"
        stats = compute_cmvn_stats(paths, conf, str(out))
        assert stats["frame_num"] == 3 * 98
        mean, istd = load_cmvn(str(out))
        assert mean.shape == (23,)
        # sanity: mean of log-mel of quiet noise is large-ish positive
        assert np.all(np.isfinite(mean)) and np.all(istd > 0)


class TestPlotDet:
    def test_renders_png(self, tmp_path):
        from wekws_tpu.bin.plot_det_curve import plot_det_curve

        stats = tmp_path / "stats.kw.txt"
        rows = [(t / 100, 5.0 * (1 - t / 100), t / 200) for t in range(100)]
        stats.write_text(
            "".join(f"{a:.3f} {b:.6f} {c:.6f}\n" for a, b, c in rows)
        )
        out = tmp_path / "det.png"
        plot_det_curve(["kw"], str(tmp_path), str(out))
        assert out.exists() and out.stat().st_size > 1000


def test_write_score_file_skips_fill_rows(tmp_path):
    """Bucketed batches carry valid=0 fill rows ('<fill>' keys) — the
    score file must contain only real utterances (round-2 regression:
    fill rows leaked into score.txt and skewed DET tables)."""
    def forward(batch):
        return batch["probs"], batch["lengths"]

    def dataset():
        rng = np.random.default_rng(0)
        yield {
            "keys": ["utt0", "utt1", "<fill>"],
            "probs": rng.uniform(0, 1, (3, 10, 1)).astype(np.float32),
            "lengths": np.full((3,), 10, np.int32),
            "valid": np.asarray([1.0, 1.0, 0.0], np.float32),
        }

    out = tmp_path / "score.txt"
    n = write_score_file(forward, dataset(), ["<A>"], str(out))
    assert n == 2
    keys = [ln.split()[0] for ln in out.read_text().splitlines()]
    assert keys == ["utt0", "utt1"]


def test_accuracy_skips_fill_rows():
    """compute_accuracy must exclude valid=0 fill rows from both
    correct and total (round-2 regression: a bucketed test config
    counted zero-rows whose argmax hit class 0 as correct)."""
    from wekws_tpu.eval.accuracy import accuracy_over_dataset

    def forward(batch):
        return batch["logits"], None

    def dataset():
        logits = np.zeros((4, 3), np.float32)
        logits[0, 1] = 1.0  # pred 1, target 1 -> hit
        logits[1, 2] = 1.0  # pred 2, target 0 -> miss
        # rows 2-3 are zero fill rows: argmax 0 == fill target 0,
        # which the old code counted as correct
        yield {
            "keys": ["utt0", "utt1", "<fill>", "<fill>"],
            "logits": logits,
            "target": np.asarray([1, 0, 0, 0]),
            "valid": np.asarray([1.0, 1.0, 0.0, 0.0], np.float32),
        }

    correct, total = accuracy_over_dataset(forward, dataset())
    assert (correct, total) == (1, 2)

    # no 'valid' key -> every row counts
    def dataset_plain():
        yield {
            "keys": ["utt0", "utt1"],
            "logits": np.asarray([[0.0, 1.0], [1.0, 0.0]], np.float32),
            "target": np.asarray([1, 1]),
        }

    assert accuracy_over_dataset(forward, dataset_plain()) == (1, 2)
