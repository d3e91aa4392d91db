"""Unit tests for the batched kernels (no Ray needed)."""

from __future__ import annotations

import functools
import itertools

import numpy as np
import pytest

from textgraphs_ray.functions.sketch import (band_keys, char_shingles,
                                             hamming64, jaccard_shingles,
                                             minhash_batch,
                                             shingle_embedding_batch,
                                             simhash_batch)
from textgraphs_ray.functions.strsim import (cosine_batch, jaro_winkler,
                                             jaro_winkler_batch,
                                             levenshtein_batch,
                                             levenshtein_sim_batch)
from textgraphs_ray.functions import kg
from textgraphs_ray.functions import nlp


def _lev_ref(a: str, b: str) -> int:
    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(d(i - 1, j) + 1, d(i, j - 1) + 1,
                   d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))
    return d(len(a), len(b))


def test_levenshtein_matches_reference_dp():
    words = ["", "a", "kitten", "sitting", "Dalton", "Dalotn", "flaw",
             "lawn", "Werner Herzog", "W. Herzog", "xyzzy"]
    pairs = list(itertools.product(words, words))
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    exp = [_lev_ref(a, b) for a, b in pairs]
    assert list(got) == exp


def test_jaro_winkler_published_values():
    assert round(jaro_winkler("martha", "marhta"), 4) == 0.9611
    assert round(jaro_winkler("dwayne", "duane"), 2) == 0.84
    assert jaro_winkler("same", "same") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0


def test_batch_wrappers():
    sims = levenshtein_sim_batch(["abcd", "abcd"], ["abcd", "abxd"])
    assert sims[0] == 1.0 and 0.7 < sims[1] < 0.8
    jws = jaro_winkler_batch(["martha"], ["marhta"])
    assert round(jws[0], 4) == 0.9611


def test_cosine_batch():
    a = np.array([[1.0, 0.0], [1.0, 1.0]])
    b = np.array([[1.0, 0.0], [-1.0, -1.0]])
    out = cosine_batch(a, b)
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(-1.0)


def test_minhash_estimates_jaccard():
    a = "alice brennan the filmmaker from berlin"
    b = "alice brenan the filmmaker from berlin"
    c = "completely different string about xylophones"
    sigs = minhash_batch([a, b, c], num_perm=256)
    est_ab = (sigs[0] == sigs[1]).mean()
    est_ac = (sigs[0] == sigs[2]).mean()
    true_ab = jaccard_shingles(a, b)
    assert abs(est_ab - true_ab) < 0.15
    assert est_ac < 0.15


def test_band_keys_lsh_property():
    sigs = minhash_batch(["werner herzog", "werner herzog", "dietrich"],
                         num_perm=64)
    bands = band_keys(sigs, bands=16)
    assert (bands[0] == bands[1]).all()          # identical strings
    assert (bands[0] == bands[2]).sum() < 16     # different strings


def test_simhash_hamming():
    h = simhash_batch(["alice brennan", "alice brenan", "zzz qqq xxx"])
    near = hamming64(h[0:1], h[1:2])[0]
    far = hamming64(h[0:1], h[2:3])[0]
    assert near < far


def test_shingle_embedding_cosine_orders_similarity():
    e = shingle_embedding_batch(["alice brennan", "ALICE BRENNAN",
                                 "alice brenan", "xylophone quartet"])
    sim_same = float(e[0] @ e[1])
    sim_near = float(e[0] @ e[2])
    sim_far = float(e[0] @ e[3])
    assert sim_same == pytest.approx(1.0, abs=1e-6)  # case-normalized
    assert sim_near > 0.8 > sim_far


def test_char_shingles():
    assert char_shingles("ab", 3) == ["ab"]
    assert char_shingles("abcd", 3) == ["abc", "bcd"]
    assert char_shingles("", 3) == []


def test_kg_normalize_prefix():
    assert kg.normalize_prefix("http://dbpedia.org/ontology/Person") == "dbo:Person"
    assert kg.normalize_prefix("http://dbpedia.org/resource/Category:Foo") == "dbc:Foo"
    assert kg.normalize_prefix("http://dbpedia.org/resource/Thing") == "dbr:Thing"
    assert kg.normalize_prefix(
        "http://www.w3.org/2002/07/owl#sameAs") == "owl:sameAs"
    assert kg.normalize_prefix("http://example.com/x") == "http://example.com/x"


def test_kg_remap_ner():
    assert kg.remap_ner("PERSON") == "http://dbpedia.org/ontology/Person"
    assert kg.remap_ner("GPE") == "http://dbpedia.org/ontology/Country"
    assert kg.remap_ner("NOPE") is None
    assert kg.remap_ner(None) is None


def test_lemma_keys_match_reference_semantics():
    # reference pipe.py:273-311 examples (FIXTURES.md F1 table)
    assert nlp.lemma_key_tokens(["werner", "herzog"], ["PROPN", "PROPN"]) == \
        "werner.PROPN.herzog.PROPN"
    assert nlp.lemma_key_single("be", "AUX", placeholder_idx=2) == "2.be.AUX"
    assert nlp.lemma_key_single("filmmaker", "NOUN") == "filmmaker.NOUN"


def test_parse_herzog_pos():
    doc = nlp.parse("Werner Herzog is a remarkable filmmaker and "
                    "intellectual originally from Germany, the son of "
                    "Dietrich Herzog.")
    ents = [(e.text, e.label) for e in doc.ents]
    assert ("Werner Herzog", "PERSON") in ents
    assert ("Germany", "GPE") in ents
    assert ("Dietrich Herzog", "PERSON") in ents
    by_text = {t.text: t for t in doc.tokens}
    assert by_text["is"].pos == "AUX" and by_text["is"].lemma == "be"
    assert by_text["filmmaker"].pos == "NOUN"
    assert by_text["remarkable"].pos == "ADJ"


def test_osa_distance():
    from textgraphs_ray.functions.strsim import osa_distance

    assert osa_distance("watanabe", "watanabe") == 0
    assert osa_distance("watanabe", "wtaanabe") == 1   # transposition
    assert osa_distance("vasquez", "vsquez") == 1      # deletion
    assert osa_distance("hassan", "hassen") == 1       # substitution
    assert osa_distance("abbott", "zhang") > 2
    # OSA counts non-adjacent rearrangement as > 1
    assert osa_distance("abcd", "cbad") == 2


def test_name_compat_typo_rules():
    from textgraphs_ray.stages.scoring import name_compat

    assert name_compat("farid watanabe", "farid wtaanabe")   # transposition
    assert name_compat("priya nakamura", "priya nkamura")    # head deletion
    assert name_compat("f. watanabe", "farid watanabe")      # initial
    assert not name_compat("farid watanabe", "gunnar watanabe")  # initials
    assert not name_compat("hiro zhang", "jiro zhang")       # distinct people


def test_deletion_band_collides_one_edit_typos():
    import numpy as np
    import pyarrow as pa

    from textgraphs_ray.stages.blocking import BandEmitter

    t = pa.table({"key": ["a", "b", "c"],
                  "text": ["Farid Watanabe", "Farid Wtaanabe",
                           "Gunnar Watanabe"]})
    out = BandEmitter()(t).to_pandas()
    dn = out[out["band_id"] == -3]
    ha = set(dn[dn["key"] == "a"]["band_hash"])
    hb = set(dn[dn["key"] == "b"]["band_hash"])
    hc = set(dn[dn["key"] == "c"]["band_hash"])
    assert ha & hb        # one-edit typo shares a deletion bucket
    assert not (ha & hc)  # different first initial → never collides


def test_imaging_codecs_roundtrip():
    """Pure-numpy PPM/BMP/WAV codecs: encode → decode is identity;
    compressed formats hit the explicit gate."""
    import numpy as np
    import pytest

    from textgraphs_ray.functions import imaging

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (21, 34, 3), dtype=np.uint8)
    assert np.array_equal(imaging.decode_ppm(imaging.encode_ppm(img)), img)
    assert np.array_equal(
        imaging.decode_bmp24(imaging.encode_bmp24(img)), img)
    # comment-tolerant PPM header
    with_comment = b"P6\n# a comment\n34 21\n255\n" + img.tobytes()
    assert np.array_equal(imaging.decode_ppm(with_comment), img)

    s = (rng.standard_normal(500) * 5000).astype(np.int16)
    s2, rate = imaging.decode_wav_pcm16(imaging.encode_wav_pcm16(s, 8000))
    assert np.array_equal(s, s2) and rate == 8000

    r = imaging.resize_nearest(img, 10, 7)
    assert r.shape == (7, 10, 3)
    # upsample keeps corner pixels
    up = imaging.resize_nearest(img, 68, 42)
    assert np.array_equal(up[0, 0], img[0, 0])

    with pytest.raises(NotImplementedError):
        imaging.decode_image(b"\x89PNG compressed")


class TestRelIRIResolution:
    """Reference two-tier rel→IRI resolution (kg.py:370-438 +
    rel.py:108-110): known Wikidata property labels hit the cache,
    unknown labels take the model-namespace literal fallback."""

    def test_known_labels_resolve_to_wikidata_properties(self):
        from textgraphs_ray.functions.kg import resolve_rel_iri

        assert resolve_rel_iri("spouse") == \
            "http://www.wikidata.org/prop/direct/P26"
        assert resolve_rel_iri("Founded By") == \
            "http://www.wikidata.org/prop/direct/P112"
        assert resolve_rel_iri("instance of") == \
            "http://www.wikidata.org/prop/direct/P31"

    def test_unknown_label_uses_reference_fallback_convention(self):
        from textgraphs_ray.functions.kg import resolve_rel_iri

        # rel.py:109: iri = "opennre:" + rel.replace(" ", "_")
        assert resolve_rel_iri("totally made up rel") == \
            "opennre:totally_made_up_rel"
        assert resolve_rel_iri("x y", fallback_ns="mrebel") == "mrebel:x_y"

    def test_compat_facade_delegates(self):
        from textgraphs_ray.compat import KGWikiMedia

        assert KGWikiMedia().resolve_rel_iri("author") == \
            "http://www.wikidata.org/prop/direct/P50"


class TestEntityQIDResolution:
    """J10 two-tier entity→QID resolution (reference kg.py:1068-1142):
    cached public sameAs facts yield real canonical QIDs; misses yield
    a collision-safe pseudo-QID (or nothing under strict=True, the
    reference's no-edge-on-API-miss behavior)."""

    def test_cached_entities_resolve_to_real_qids(self):
        from textgraphs_ray.functions.kg import wikidata_iri

        assert wikidata_iri("Germany") == \
            "http://www.wikidata.org/entity/Q183"
        assert wikidata_iri("werner herzog") == \
            "http://www.wikidata.org/entity/Q44131"
        assert wikidata_iri("  Berlin ") == \
            "http://www.wikidata.org/entity/Q64"

    def test_miss_yields_stable_collision_safe_pseudo_qid(self):
        from textgraphs_ray.functions.kg import wikidata_iri

        a = wikidata_iri("Dietrich Herzog")
        assert a == wikidata_iri("Dietrich Herzog")  # deterministic
        qnum = int(a.rsplit("Q", 1)[1])
        assert qnum >= 2_000_000_000  # far above the real QID range

    def test_strict_miss_emits_nothing(self):
        from textgraphs_ray.functions.kg import wikidata_iri

        assert wikidata_iri("Dietrich Herzog", strict=True) == ""
        assert wikidata_iri("Germany", strict=True) == \
            "http://www.wikidata.org/entity/Q183"


# ---- soundex (functions/strsim.py) ----------------------------------

def test_soundex_canonical_examples():
    from textgraphs_ray.functions.strsim import soundex

    cases = {"Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
             "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
             "Honeyman": "H555", "Williams": "W452",
             "Auerbach": "A612", "Jackson": "J250", "Lee": "L000",
             "Gutierrez": "G362", "Washington": "W252", "": "",
             "123": ""}
    for w, want in cases.items():
        assert soundex(w) == want, (w, soundex(w), want)


def test_soundex_blocks_sound_alikes():
    from textgraphs_ray.functions.strsim import soundex

    # the ER blocking property: spelling variants share a block
    assert soundex("Smith") == soundex("Smyth")
    assert soundex("Johnson") != soundex("Smith")


def test_round_half_away_matches_duckdb_on_ties():
    import duckdb
    import numpy as np

    from textgraphs_ray.functions.rounding import round_half_away

    vals = [-225 / 5760, 225 / 5760, 0.0000005, -0.0000005,
            0.1234565, 1.5, -2.5, 0.0, 0.1234564999]
    got = round_half_away(np.array(vals), 6)
    want = [duckdb.sql(f"select round({v!r}::DOUBLE, 6)").fetchone()[0]
            for v in vals]
    assert list(got) == want
