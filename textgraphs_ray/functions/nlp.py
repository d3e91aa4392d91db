"""Deterministic, dependency-free linguistic stand-in for spaCy.

The reference loads three ``spacy.load`` pipelines per process
(``/root/reference/textgraphs/pipe.py:440-511``).  This sandbox has no
model downloads, so the engine ships a small rule-based tokenizer /
POS-tagger / lemmatizer / NER whose behavior is pure and deterministic
— which is exactly what the correctness gates need (span-sequence
equality, golden fixtures).  The *plumbing* (actor pools loading this
"model" once per worker, batched inference) is identical to what a real
spaCy/transformer deployment would use.

Outputs follow the reference semantics:

- lemma key = ``"<lemma>.<POS>"`` terms joined with ``.``, lower-cased,
  placeholder (DEP) variant prefixes the token index
  (``pipe.py:273-311``).
- span kind priority ENT > LEM(NOUN/PROPN/VERB) > DEP
  (``doc.py:199-239``).
- noun chunks = maximal ``DET? ADJ* (NOUN|PROPN)+`` runs, kept only when
  not subsumed by an entity (``pipe.py:327-373``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# an initial ("W.") stays one token — spaCy's tokenizer exceptions do
# the same for abbreviations (reference relies on spaCy here)
TOKEN_RE = re.compile(r"\b[A-Z]\.(?=\s+[A-Z])|[A-Za-z0-9_']+|[^\sA-Za-z0-9_']",
                      re.UNICODE)
# don't break a sentence after a single-capital initial
SENT_SPLIT_RE = re.compile(r"(?<=[.!?])(?<!\b[A-Z]\.)\s+")

# Closed-class word lists (tiny, deterministic; POS tags follow the
# Universal Dependencies tag set the reference's spaCy models emit).
_DET = {"a", "an", "the", "this", "that", "these", "those", "some", "any", "no", "every", "each"}
_AUX = {"is", "are", "was", "were", "be", "been", "being", "am", "will", "would", "can",
        "could", "shall", "should", "may", "might", "must", "do", "does", "did", "has",
        "have", "had", "'s", "'re", "'ve", "'ll", "'d"}
_ADP = {"of", "from", "to", "in", "on", "at", "by", "with", "for", "about", "into",
        "over", "under", "after", "before", "between", "through", "during", "against",
        "among", "without", "within", "upon", "across", "behind", "beyond", "near"}
_PRON = {"i", "you", "he", "she", "it", "we", "they", "me", "him", "her", "us", "them",
         "my", "your", "his", "its", "our", "their", "who", "whom", "which", "what",
         "himself", "herself", "itself", "themselves", "myself"}
_CCONJ = {"and", "or", "but", "nor", "yet", "so"}
_SCONJ = {"if", "because", "while", "although", "though", "since", "unless", "whereas",
          "when", "where", "as", "than"}
_ADV = {"not", "very", "too", "also", "then", "there", "here", "now", "just", "only",
        "again", "once", "never", "always", "often", "soon", "later", "originally",
        "famously", "already", "still"}
_PART = {"to"}

# Common verbs (base + inflected) so sentence-initial capitals resolve.
_VERBS = {"see", "sees", "saw", "seen", "run", "runs", "ran", "running", "go", "goes",
          "went", "gone", "become", "became", "becomes", "becoming", "make", "makes",
          "made", "making", "direct", "directed", "directs", "act", "acted", "acts",
          "live", "lived", "lives", "living", "bear", "born", "flee", "fled", "flees",
          "write", "wrote", "written", "writes", "work", "worked", "works", "working",
          "found", "founded", "founds", "win", "won", "wins", "play", "played", "plays",
          "say", "said", "says", "take", "took", "taken", "takes", "give", "gave",
          "given", "gives", "know", "knew", "known", "knows", "think", "thought",
          "thinks", "come", "came", "comes", "use", "used", "uses", "visit", "visited",
          "visits", "meet", "met", "meets", "moved", "move", "moves", "studied",
          "study", "studies", "teaches", "taught", "teach"}

_LEMMA_EXC = {
    "is": "be", "are": "be", "was": "be", "were": "be", "been": "be", "am": "be",
    "being": "be", "'s": "be", "has": "have", "had": "have", "does": "do", "did": "do",
    "ran": "run", "running": "run", "saw": "see", "seen": "see", "sees": "see",
    "went": "go", "gone": "go", "goes": "go", "became": "become", "becomes": "become",
    "becoming": "become", "made": "make", "makes": "make", "making": "make",
    "fled": "flee", "flees": "flee", "wrote": "write", "written": "write",
    "won": "win", "wins": "win", "said": "say", "says": "say", "took": "take",
    "taken": "take", "takes": "take", "gave": "give", "given": "give", "gives": "give",
    "knew": "know", "known": "know", "knows": "know", "thought": "think",
    "thinks": "think", "came": "come", "comes": "come", "met": "meet", "meets": "meet",
    "children": "child", "men": "man", "women": "woman", "people": "person",
    "studied": "study", "studies": "study", "taught": "teach", "teaches": "teach",
    "directed": "direct", "directs": "direct", "acted": "act", "acts": "act",
    "lived": "live", "lives": "live", "living": "live", "moved": "move",
    "moves": "move", "worked": "work", "works": "work", "working": "work",
    "founded": "found", "founds": "found", "used": "use", "uses": "use",
    "visited": "visit", "visits": "visit", "played": "play", "plays": "play",
}

_ADJ_SUFFIX = ("able", "ible", "ous", "ful", "ive", "less", "ish", "ant", "ent")

# Small gazetteer for NER labels (OntoTypes4 labels the reference's
# ``NER_MAP`` consumes, ``kg.py:52-143``).
_GPE = {"germany", "america", "usa", "california", "france", "england", "japan",
        "san_francisco", "berlin", "munich", "paris", "london", "tokyo", "texas",
        "canada", "mexico", "spain", "italy", "china", "india", "russia", "brazil"}


def sentences(text: str) -> list[str]:
    """Split paragraph text into sentences (deterministic regex)."""
    parts = [s for s in SENT_SPLIT_RE.split(text.strip()) if s]
    return parts if parts else [text]


def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text)


@dataclass
class Token:
    i: int            # token index within the document
    text: str
    pos: str = ""
    lemma: str = ""
    sent_id: int = 0
    head: int = 0     # head token index within the document
    dep: str = "dep"
    ent_label: str = ""   # non-empty iff inside an entity span


@dataclass
class EntSpan:
    start: int        # token index
    length: int
    label: str
    text: str


@dataclass
class ChunkSpan:
    start: int
    length: int
    text: str
    lemma_key: str = ""


@dataclass
class ParsedDoc:
    tokens: list[Token] = field(default_factory=list)
    ents: list[EntSpan] = field(default_factory=list)
    chunks: list[ChunkSpan] = field(default_factory=list)


def lemma_of(word: str) -> str:
    w = word.lower()
    if w in _LEMMA_EXC:
        return _LEMMA_EXC[w]
    if len(w) > 4 and w.endswith("ies"):
        return w[:-3] + "y"
    if len(w) > 3 and w.endswith("sses"):
        return w[:-2]
    if len(w) > 3 and w.endswith("s") and not w.endswith("ss") and not w.endswith("us"):
        return w[:-1]
    return w


def pos_of(word: str, *, sent_initial: bool, prev_pos: str) -> str:
    """Rule-based UD POS tag. Deterministic; mirrors what the reference
    consumes from spaCy (NOUN/PROPN/VERB drive node kinds,
    ``doc.py:216``)."""
    w = word.lower()
    if not word[:1].isalnum():
        return "PUNCT"
    if word[:1].isdigit():
        return "NUM"
    if w in _DET:
        return "DET"
    if w in _PART and prev_pos in ("VERB", "AUX", ""):
        return "PART"
    if w in _ADP:
        return "ADP"
    if w in _AUX:
        return "AUX"
    if w in _PRON:
        return "PRON"
    if w in _CCONJ:
        return "CCONJ"
    if w in _SCONJ:
        return "SCONJ"
    if w in _ADV or (w.endswith("ly") and len(w) > 4):
        return "ADV"
    if word[:1].isupper():
        # Capitalized: proper noun, unless sentence-initial and the
        # lowercase form is a known common word.
        if sent_initial and (w in _VERBS or w in _LEMMA_EXC):
            return "VERB"
        if sent_initial and (w in _DET | _ADP | _PRON | _SCONJ | _ADV):
            return pos_of(w, sent_initial=False, prev_pos=prev_pos)
        return "PROPN"
    if w in _VERBS:
        return "VERB"
    if w.endswith(_ADJ_SUFFIX) and len(w) > 4:
        return "ADJ"
    if w.endswith("ed") and len(w) > 4:
        return "VERB"
    if w.endswith("ing") and len(w) > 5:
        return "VERB"
    return "NOUN"


def ner_label(surface: str) -> str:
    key = surface.lower().replace(" ", "_")
    if key in _GPE:
        return "GPE"
    return "PERSON"


def parse(text: str) -> ParsedDoc:
    """Tokenize + tag + NER + dependency heads + noun chunks.

    Dependency structure is a deterministic approximation: each token's
    head is the nearest following VERB/AUX in the sentence, else the
    sentence's first content token (root points to itself).  ``nsubj``
    is the first NOUN/PROPN before the first verb, ``pobj`` any
    NOUN/PROPN right after an ADP — enough to reproduce the reference's
    ``sub_obj`` marking (``doc.py:462-463``).
    """
    doc = ParsedDoc()
    tok_i = 0
    for sent_id, sent in enumerate(sentences(text)):
        words = tokenize(sent)
        sent_start = tok_i
        prev_pos = ""
        toks: list[Token] = []
        for j, w in enumerate(words):
            pos = pos_of(w, sent_initial=(j == 0), prev_pos=prev_pos)
            toks.append(Token(i=tok_i, text=w, pos=pos, lemma=lemma_of(w), sent_id=sent_id))
            prev_pos = pos
            tok_i += 1

        # entities: maximal PROPN runs
        j = 0
        while j < len(toks):
            if toks[j].pos == "PROPN":
                k = j
                while k + 1 < len(toks) and toks[k + 1].pos == "PROPN":
                    k += 1
                surface = " ".join(t.text for t in toks[j: k + 1])
                label = ner_label(surface)
                ent = EntSpan(start=toks[j].i, length=k - j + 1, label=label, text=surface)
                doc.ents.append(ent)
                for t in toks[j: k + 1]:
                    t.ent_label = label
                j = k + 1
            else:
                j += 1

        # dependency heads
        verb_idx = [j for j, t in enumerate(toks) if t.pos in ("VERB", "AUX")]
        root_local = verb_idx[0] if verb_idx else 0
        for j, t in enumerate(toks):
            if j == root_local:
                t.head = sent_start + root_local
                t.dep = "ROOT"
                continue
            nxt = next((v for v in verb_idx if v > j), root_local)
            t.head = sent_start + nxt
            if t.pos in ("NOUN", "PROPN"):
                if j < root_local:
                    t.dep = "nsubj"
                elif j > 0 and toks[j - 1].pos == "ADP":
                    t.dep = "pobj"
                else:
                    t.dep = "obj" if t.pos == "NOUN" else "appos"
            elif t.pos == "PUNCT":
                t.dep = "punct"
                t.head = sent_start + root_local
            elif t.pos == "DET":
                t.dep = "det"
            elif t.pos == "ADJ":
                t.dep = "amod"
            elif t.pos == "ADP":
                t.dep = "prep"
            else:
                t.dep = "dep"

        # noun chunks: DET? ADJ* (NOUN|PROPN)+
        j = 0
        while j < len(toks):
            if toks[j].pos in ("DET", "ADJ", "NOUN", "PROPN"):
                k = j
                seen_nominal = False
                while k < len(toks) and toks[k].pos in ("DET", "ADJ", "NOUN", "PROPN"):
                    if toks[k].pos in ("NOUN", "PROPN"):
                        seen_nominal = True
                    k += 1
                if seen_nominal:
                    # trim leading DET/ADJ-only prefix is kept (spaCy
                    # chunks include determiners); trim trailing non-nominals
                    end = k - 1
                    while toks[end].pos not in ("NOUN", "PROPN"):
                        end -= 1
                    chunk_toks = toks[j: end + 1]
                    doc.chunks.append(ChunkSpan(
                        start=chunk_toks[0].i,
                        length=len(chunk_toks),
                        text=" ".join(t.text for t in chunk_toks),
                    ))
                j = k
            else:
                j += 1

        doc.tokens.extend(toks)
    return doc


def lemma_key_tokens(lemmas: list[str], poses: list[str]) -> str:
    """Compose the invariant lemma key for a multi-token span
    (reference ``pipe.py:301-311``)."""
    terms: list[str] = []
    for lem, pos in zip(lemmas, poses):
        terms.append(lem.strip().lower())
        terms.append(pos)
    return ".".join(terms)


def lemma_key_single(lemma: str, pos: str, *, placeholder_idx: int | None = None) -> str:
    """Single-token lemma key; placeholder variant prefixes the token
    index so stopwords never merge (reference ``pipe.py:292-299``)."""
    terms = [lemma.strip().lower(), pos]
    if placeholder_idx is not None:
        terms.insert(0, str(placeholder_idx))
    return ".".join(terms)
