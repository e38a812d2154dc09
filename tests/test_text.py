import pytest

from dynamic_asr_eval_tpu.text import (
    CharTokenizer,
    VocabTokenizer,
    normalize,
    word_error_rate_detail,
    cer,
)


class TestWER:
    def test_perfect(self):
        wer, words, i, d, s = word_error_rate_detail(["a b c"], ["a b c"])
        assert wer == 0.0 and words == 3 and i == d == s == 0.0

    def test_substitution(self):
        wer, words, i, d, s = word_error_rate_detail(["a x c"], ["a b c"])
        assert wer == pytest.approx(1 / 3)
        assert s == pytest.approx(1 / 3) and i == 0 and d == 0

    def test_insertion_deletion(self):
        wer, words, ins, dele, sub = word_error_rate_detail(["a b c d"], ["a b c"])
        assert ins == pytest.approx(1 / 3) and dele == 0 and sub == 0
        wer, words, ins, dele, sub = word_error_rate_detail(["a c"], ["a b c"])
        assert dele == pytest.approx(1 / 3) and ins == 0 and sub == 0

    def test_corpus_accumulation(self):
        # corpus WER = total errors / total ref words, not mean of per-utt WERs
        wer, words, *_ = word_error_rate_detail(["a", "x y z w"], ["a", "a b c d"])
        assert words == 5
        assert wer == pytest.approx(4 / 5)

    def test_empty_hyp(self):
        wer, *_ = word_error_rate_detail([""], ["a b"])
        assert wer == 1.0

    def test_cer(self):
        assert cer(["abc"], ["abd"]) == pytest.approx(1 / 3)

    def test_wer_matches_bruteforce_levenshtein(self):
        import itertools, random

        random.seed(0)
        vocab = ["a", "b", "c"]
        for _ in range(50):
            ref = [random.choice(vocab) for _ in range(random.randint(0, 5))]
            hyp = [random.choice(vocab) for _ in range(random.randint(0, 5))]
            wer, words, i, d, s = word_error_rate_detail([" ".join(hyp)], [" ".join(ref)])
            # brute force min edit distance
            import numpy as np

            H, R = len(hyp), len(ref)
            dp = np.zeros((H + 1, R + 1))
            dp[:, 0] = np.arange(H + 1)
            dp[0, :] = np.arange(R + 1)
            for a in range(1, H + 1):
                for b in range(1, R + 1):
                    dp[a, b] = min(
                        dp[a - 1, b - 1] + (hyp[a - 1] != ref[b - 1]),
                        dp[a - 1, b] + 1,
                        dp[a, b - 1] + 1,
                    )
            expected = dp[H, R] / max(R, 1) if R else (float("inf") if H else 0.0)
            if R:
                assert wer == pytest.approx(expected)
                assert (i + d + s) == pytest.approx(wer)


class TestNormalizer:
    def test_basic(self):
        assert normalize("Hello, World!") == "hello world"

    def test_whisper_style(self):
        # contractions and titles per Whisper's English normalizer
        out = normalize("it's Mr. Smith")
        assert "it is" in out and "mister smith" in out

    def test_british_american_spelling(self):
        # the reference normalizes through whisper's english.json spelling
        # table (lcasr/run.py:8-9); ours is regenerated in text/spelling.py
        pairs = [
            ("colour", "color"), ("organised", "organized"),
            ("analyse", "analyze"), ("travelled", "traveled"),
            ("defence", "defense"), ("programme", "program"),
            ("favourite", "favorite"), ("theatre", "theater"),
            ("catalogue", "catalog"), ("manoeuvre", "maneuver"),
            ("paediatric", "pediatric"), ("grey", "gray"),
        ]
        for british, american in pairs:
            assert normalize(british) == american, british
        # words that are NOT British variants must pass through unchanged
        for word in ["surprise", "advertise", "exercise", "promise",
                     "compromise", "practice", "patrolled", "cancellation",
                     "greyhound", "televise"]:
            assert normalize(word) == word, word

    def test_spelling_table_size(self):
        from dynamic_asr_eval_tpu.text.spelling import english_spelling_mapping

        m = english_spelling_mapping()
        assert len(m) > 1500  # whisper's english.json is ~1.7k entries
        assert all(k != v for k, v in m.items())


class TestTokenizers:
    def test_char_roundtrip(self):
        tok = CharTokenizer()
        ids = tok.encode("hello world")
        assert tok.decode(ids) == "hello world"
        assert tok.vocab_size() == 28
        assert tok.blank_id == 28

    def test_char_drops_unknown(self):
        tok = CharTokenizer()
        assert tok.decode(tok.encode("héllo!")) == "hllo"

    def test_vocab_tokenizer_greedy(self):
        tok = VocabTokenizer(["▁the", "▁cat", "▁c", "a", "t", "▁"])
        ids = tok.encode("the cat")
        assert tok.decode(ids) == "the cat"


class TestSentencePieceParser:
    def test_wire_parse(self):
        # hand-build a tiny ModelProto: pieces [("<unk>",0,UNKNOWN),("▁a",-1.5,NORMAL)]
        import struct

        def sp(piece, score, ptype):
            body = b""
            pb = piece.encode("utf-8")
            body += bytes([0x0A, len(pb)]) + pb  # field1 len-delim
            body += bytes([0x15]) + struct.pack("<f", score)  # field2 32-bit
            body += bytes([0x18, ptype])  # field3 varint
            return bytes([0x0A, len(body)]) + body  # outer field1

        data = sp("<unk>", 0.0, 2) + sp("▁a", -1.5, 1) + sp("b", -2.0, 1)
        from dynamic_asr_eval_tpu.text.tokenizer import (
            SentencePieceTokenizer,
            parse_sentencepiece_model,
        )

        pieces, scores, types = parse_sentencepiece_model(data)
        assert pieces == ["<unk>", "▁a", "b"]
        assert scores[1] == pytest.approx(-1.5)
        assert types == [2, 1, 1]
        tok = SentencePieceTokenizer(pieces, scores, types)
        ids = tok.encode("ab")
        assert tok.decode(ids) == "ab"
