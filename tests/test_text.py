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


class TestSpellingGoldenSet:
    """VERDICT r4 ask #4: the ~200 highest-frequency British forms as an
    explicit expected-mapping golden set (turning "table is big" into "table
    is right where it matters"), plus idempotence and hypothesis/gold
    equal-treatment properties.  Matches the scoring role of whisper's
    english.json in the reference (lcasr/run.py:8-9)."""

    # (british, american) — curated by corpus frequency of the British form
    GOLDEN = [
        # -our family
        ("colour", "color"), ("colours", "colors"), ("coloured", "colored"),
        ("colourful", "colorful"), ("colouring", "coloring"),
        ("honour", "honor"), ("honours", "honors"), ("honoured", "honored"),
        ("honourable", "honorable"),
        ("favour", "favor"), ("favours", "favors"), ("favoured", "favored"),
        ("favourite", "favorite"), ("favourites", "favorites"),
        ("favourable", "favorable"), ("favourably", "favorably"),
        ("flavour", "flavor"), ("flavours", "flavors"),
        ("flavoured", "flavored"),
        ("labour", "labor"), ("labours", "labors"), ("laboured", "labored"),
        ("labourer", "laborer"), ("labourers", "laborers"),
        ("neighbour", "neighbor"), ("neighbours", "neighbors"),
        ("neighbouring", "neighboring"),
        ("neighbourhood", "neighborhood"),
        ("neighbourhoods", "neighborhoods"),
        ("humour", "humor"), ("rumour", "rumor"), ("rumours", "rumors"),
        ("armour", "armor"), ("armoured", "armored"),
        ("harbour", "harbor"), ("harbours", "harbors"),
        ("behaviour", "behavior"), ("behaviours", "behaviors"),
        ("behavioural", "behavioral"),
        ("endeavour", "endeavor"), ("endeavours", "endeavors"),
        ("vigour", "vigor"), ("rigour", "rigor"), ("candour", "candor"),
        ("splendour", "splendor"), ("valour", "valor"), ("odour", "odor"),
        ("odours", "odors"), ("parlour", "parlor"),
        ("savoury", "savory"),
        # -ise family
        ("realise", "realize"), ("realised", "realized"),
        ("realises", "realizes"), ("realising", "realizing"),
        ("realisation", "realization"),
        ("organise", "organize"), ("organised", "organized"),
        ("organising", "organizing"), ("organisation", "organization"),
        ("organisations", "organizations"),
        ("recognise", "recognize"), ("recognised", "recognized"),
        ("recognises", "recognizes"), ("recognising", "recognizing"),
        ("apologise", "apologize"), ("apologised", "apologized"),
        ("criticise", "criticize"), ("criticised", "criticized"),
        ("criticising", "criticizing"),
        ("emphasise", "emphasize"), ("emphasised", "emphasized"),
        ("specialise", "specialize"), ("specialised", "specialized"),
        ("specialising", "specializing"),
        ("minimise", "minimize"), ("minimised", "minimized"),
        ("maximise", "maximize"), ("maximised", "maximized"),
        ("utilise", "utilize"), ("utilised", "utilized"),
        ("utilising", "utilizing"), ("utilisation", "utilization"),
        ("summarise", "summarize"), ("summarised", "summarized"),
        ("categorise", "categorize"), ("prioritise", "prioritize"),
        ("capitalise", "capitalize"), ("centralise", "centralize"),
        ("characterise", "characterize"),
        ("characterised", "characterized"),
        ("colonise", "colonize"), ("customise", "customize"),
        ("customised", "customized"),
        ("digitise", "digitize"), ("dramatise", "dramatize"),
        ("economise", "economize"), ("equalise", "equalize"),
        ("familiarise", "familiarize"), ("fertilise", "fertilize"),
        ("fertiliser", "fertilizer"), ("fertilisers", "fertilizers"),
        ("finalise", "finalize"), ("finalised", "finalized"),
        ("formalise", "formalize"), ("generalise", "generalize"),
        ("generalised", "generalized"),
        ("globalisation", "globalization"),
        ("harmonise", "harmonize"), ("hospitalised", "hospitalized"),
        ("immunise", "immunize"), ("immunisation", "immunization"),
        ("legalise", "legalize"), ("legalised", "legalized"),
        ("liberalise", "liberalize"), ("localised", "localized"),
        ("memorise", "memorize"), ("memorised", "memorized"),
        ("mobilise", "mobilize"), ("mobilised", "mobilized"),
        ("modernise", "modernize"), ("modernised", "modernized"),
        ("nationalise", "nationalize"), ("nationalised", "nationalized"),
        ("neutralise", "neutralize"), ("neutralised", "neutralized"),
        ("normalise", "normalize"), ("normalised", "normalized"),
        ("optimise", "optimize"), ("optimised", "optimized"),
        ("penalise", "penalize"), ("penalised", "penalized"),
        ("personalised", "personalized"),
        ("popularised", "popularized"),
        ("privatise", "privatize"), ("privatised", "privatized"),
        ("privatisation", "privatization"),
        ("publicise", "publicize"), ("publicised", "publicized"),
        ("randomised", "randomized"),
        ("rationalise", "rationalize"),
        ("revolutionise", "revolutionize"),
        ("revolutionised", "revolutionized"),
        ("scrutinise", "scrutinize"), ("scrutinised", "scrutinized"),
        ("socialise", "socialize"), ("socialised", "socialized"),
        ("stabilise", "stabilize"), ("stabilised", "stabilized"),
        ("standardise", "standardize"), ("standardised", "standardized"),
        ("sterilise", "sterilize"), ("sterilised", "sterilized"),
        ("subsidise", "subsidize"), ("subsidised", "subsidized"),
        ("subsidises", "subsidizes"),
        ("symbolise", "symbolize"), ("sympathise", "sympathize"),
        ("synchronise", "synchronize"), ("synchronised", "synchronized"),
        ("terrorise", "terrorize"), ("theorise", "theorize"),
        ("visualise", "visualize"), ("visualised", "visualized"),
        # -yse
        ("analyse", "analyze"), ("analysed", "analyzed"),
        ("analysing", "analyzing"), ("paralyse", "paralyze"),
        ("paralysed", "paralyzed"), ("catalyse", "catalyze"),
        # -re
        ("centre", "center"), ("centres", "centers"), ("centred", "centered"),
        ("theatre", "theater"), ("theatres", "theaters"),
        ("metre", "meter"), ("metres", "meters"),
        ("litre", "liter"), ("litres", "liters"),
        ("fibre", "fiber"), ("fibres", "fibers"),
        ("calibre", "caliber"),
        ("kilometre", "kilometer"), ("kilometres", "kilometers"),
        ("centimetre", "centimeter"), ("centimetres", "centimeters"),
        ("millimetre", "millimeter"), ("millimetres", "millimeters"),
        ("sombre", "somber"), ("spectre", "specter"),
        ("lustre", "luster"), ("meagre", "meager"),
        ("epicentre", "epicenter"),
        # -ogue
        ("catalogue", "catalog"), ("catalogues", "catalogs"),
        ("dialogue", "dialog"), ("dialogues", "dialogs"),
        ("analogue", "analog"), ("monologue", "monolog"),
        ("prologue", "prolog"), ("epilogue", "epilog"),
        # doubled-l inflections
        ("travelled", "traveled"), ("travelling", "traveling"),
        ("traveller", "traveler"), ("travellers", "travelers"),
        ("cancelled", "canceled"), ("cancelling", "canceling"),
        ("labelled", "labeled"), ("labelling", "labeling"),
        ("modelled", "modeled"), ("modelling", "modeling"),
        ("levelled", "leveled"), ("channelled", "channeled"),
        ("counselled", "counseled"), ("counselling", "counseling"),
        ("counsellor", "counselor"), ("counsellors", "counselors"),
        ("signalled", "signaled"), ("signalling", "signaling"),
        ("totalled", "totaled"), ("totalling", "totaling"),
        ("fuelled", "fueled"), ("fuelling", "fueling"),
        ("dialled", "dialed"), ("dialling", "dialing"),
        ("equalled", "equaled"), ("marvelled", "marveled"),
        ("marvellous", "marvelous"),
        ("quarrelled", "quarreled"), ("rivalled", "rivaled"),
        ("shovelled", "shoveled"), ("pedalled", "pedaled"),
        ("panelled", "paneled"), ("gruelling", "grueling"),
        # -ence → -ense
        ("defence", "defense"), ("defences", "defenses"),
        ("offence", "offense"), ("offences", "offenses"),
        ("licence", "license"), ("licences", "licenses"),
        ("pretence", "pretense"),
        # -amme
        ("programme", "program"), ("programmes", "programs"),
        # high-frequency irregulars
        ("grey", "gray"), ("greys", "grays"),
        ("tyre", "tire"), ("tyres", "tires"),
        ("cheque", "check"), ("cheques", "checks"),
        ("plough", "plow"), ("mould", "mold"), ("moulded", "molded"),
        ("mouldy", "moldy"), ("moustache", "mustache"),
        ("pyjamas", "pajamas"), ("aluminium", "aluminum"),
        ("aeroplane", "airplane"), ("aeroplanes", "airplanes"),
        ("draught", "draft"), ("draughts", "drafts"),
        ("gaol", "jail"), ("kerb", "curb"),
        ("storey", "story"), ("storeys", "stories"),
        ("sulphur", "sulfur"), ("sulphuric", "sulfuric"),
        ("yoghurt", "yogurt"), ("doughnut", "donut"),
        ("doughnuts", "donuts"),
        ("judgement", "judgment"), ("judgements", "judgments"),
        ("practise", "practice"), ("practised", "practiced"),
        ("practising", "practicing"), ("practises", "practices"),
        ("sceptic", "skeptic"), ("sceptical", "skeptical"),
        ("scepticism", "skepticism"),
        ("speciality", "specialty"), ("specialities", "specialties"),
        ("artefact", "artifact"), ("artefacts", "artifacts"),
        ("ageing", "aging"), ("omelette", "omelet"),
        ("enrol", "enroll"), ("enrolment", "enrollment"),
        ("fulfil", "fulfill"), ("fulfilment", "fulfillment"),
        ("instalment", "installment"), ("instalments", "installments"),
        ("wilful", "willful"), ("skilful", "skillful"),
        ("distil", "distill"), ("instil", "instill"),
        ("woollen", "woolen"), ("jewellery", "jewelry"),
        ("cosy", "cozy"), ("chilli", "chili"),
        ("smoulder", "smolder"), ("smouldering", "smoldering"),
        ("tsar", "czar"), ("titbit", "tidbit"),
        ("mediaeval", "medieval"), ("encyclopaedia", "encyclopedia"),
        ("anaesthesia", "anesthesia"), ("anaesthetic", "anesthetic"),
        ("paediatrician", "pediatrician"), ("leukaemia", "leukemia"),
        ("haemorrhage", "hemorrhage"), ("oesophagus", "esophagus"),
        ("oestrogen", "estrogen"), ("foetus", "fetus"),
        ("manoeuvre", "maneuver"), ("manoeuvres", "maneuvers"),
        ("focussed", "focused"), ("focussing", "focusing"),
        ("orientated", "oriented"),
    ]

    def test_golden_mappings(self):
        from dynamic_asr_eval_tpu.text.spelling import english_spelling_mapping

        m = english_spelling_mapping()
        missing = [(b, a) for b, a in self.GOLDEN if m.get(b) != a]
        assert not missing, f"{len(missing)} golden entries wrong/absent: {missing[:20]}"

    def test_idempotent(self):
        """Mapping values are fixed points — no british→X→Y chains, and
        normalize(normalize(s)) == normalize(s)."""
        from dynamic_asr_eval_tpu.text.spelling import english_spelling_mapping

        m = english_spelling_mapping()
        chained = [(k, v, m[v]) for k, v in m.items() if v in m]
        assert not chained, chained[:10]
        text = " ".join(b for b, _ in self.GOLDEN[:60])
        once = normalize(text)
        assert normalize(once) == once

    def test_hypothesis_gold_equal_treatment(self):
        """A British-spelled gold vs an American-spelled hypothesis must
        score ZERO errors after normalization — the scoring property the
        table exists for."""
        from dynamic_asr_eval_tpu.text.wer import word_error_rate_detail

        gold = " ".join(b for b, _ in self.GOLDEN)
        hyp = " ".join(a for _, a in self.GOLDEN)
        wer = word_error_rate_detail([normalize(hyp)], [normalize(gold)])[0]
        assert wer == 0.0
