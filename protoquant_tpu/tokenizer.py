"""Byte-level BPE tokenizer loading HuggingFace ``tokenizer.json`` files.

Serving-surface component beyond the reference's scope (the reference has
no text tier at all): turns the HTTP/CLI boundary from token ids into text.
From-scratch implementation — the JSON parsing, byte-level mapping and
pre-tokenization live here; the per-word merge loop is the native C++
``BpeMerger`` (protoquant_tpu/native/pq_bpe.cpp, pure-Python fallback).

Supported tokenizer.json shapes (the three families the model zoo uses):
  * byte-level BPE (GPT-2 / Llama-3 / Qwen): ByteLevel pre-tokenizer with a
    split regex, byte->unicode table, ByteLevel decoder;
  * metaspace BPE (Llama-2 / Mistral SentencePiece exports): whitespace
    replaced by ▁ with prefix insertion, byte-fallback <0xNN> tokens;
  * SentencePiece-Unigram (Gemma / T5 lineage): Viterbi max-log-prob
    segmentation over the piece lattice, unk fusing + byte fallback.

Exactness: tests/test_tokenizer.py round-trips and encode-compares against
the ``tokenizers`` library on synthesized tokenizer.json files (trained on
the fly), including unicode, whitespace runs, and special tokens.
"""

from __future__ import annotations

import json

# GPT-2's split pattern (contractions, letter runs, number runs, punct runs,
# trailing-space handling). Llama-3/Qwen ship their own pattern inside
# tokenizer.json, which we read when present.
_GPT2_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)

_METASPACE = "▁"


def _byte_to_unicode() -> dict:
    """GPT-2's reversible byte -> printable-unicode mapping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAD))
        + list(range(0xAE, 0x100))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


class Tokenizer:
    """encode(text) -> ids / decode(ids) -> text over an HF tokenizer.json."""

    def __init__(self, spec: dict):
        model = spec.get("model", {})
        self.model_type = model.get("type")
        if self.model_type == "Unigram":
            # SentencePiece-Unigram (Gemma/T5 lineage): vocab is a list of
            # [piece, log_prob]; encoding is a Viterbi max-score
            # segmentation over the piece lattice (see _viterbi).
            entries = model["vocab"]
            self.vocab = {p: i for i, (p, _s) in enumerate(entries)}
            self._uni = {p: (i, float(s)) for i, (p, s) in enumerate(entries)}
            self._uni_maxlen = max((len(p) for p, _ in entries), default=1)
            min_score = min((float(s) for _, s in entries), default=0.0)
            # HF tokenizers' Unigram: unknown characters cost
            # min_score - 10 (the SentencePiece kUnkPenalty convention).
            self._unk_score = min_score - 10.0
            self._uni_unk = model.get("unk_id")
            # tokenizers' Unigram deserializer sets fuse_unk whenever an
            # unk_id exists (the field is not serialized): consecutive
            # unknown characters collapse into ONE unk token.
            self._fuse_unk = bool(
                model.get("fuse_unk", self._uni_unk is not None)
            )
            self.id_to_token = {i: t for t, i in self.vocab.items()}
            self._merger = None
        elif self.model_type == "BPE":
            self.vocab: dict[str, int] = model["vocab"]
            self.id_to_token = {i: t for t, i in self.vocab.items()}
            merges = []
            for m in model.get("merges", []):
                a, b = m if isinstance(m, (list, tuple)) else m.split(" ", 1)
                merges.append((self.vocab[a], self.vocab[b], self.vocab[a + b]))
            from .native import BpeMerger

            self._merger = BpeMerger(merges)
        else:
            raise ValueError(
                f"unsupported tokenizer model {self.model_type!r}"
            )

        # Added/special tokens split out before pre-tokenization and decode
        # back verbatim.
        self.added: dict[str, int] = {}
        self.special_ids: set[int] = set()
        for t in spec.get("added_tokens", []):
            self.added[t["content"]] = t["id"]
            self.id_to_token[t["id"]] = t["content"]
            if t.get("special"):
                self.special_ids.add(t["id"])

        # Pre-tokenizer family.
        pre = spec.get("pre_tokenizer") or {}
        pres = pre.get("pretokenizers", [pre]) if pre else []
        self.byte_level = any(p.get("type") == "ByteLevel" for p in pres)
        self.metaspace = any(
            p.get("type") in ("Metaspace",) for p in pres
        ) or (spec.get("decoder") or {}).get("type") == "Metaspace"
        self.pattern = _GPT2_PATTERN
        self.add_prefix_space = False
        for p in pres:
            if p.get("type") == "Split" and isinstance(p.get("pattern"), dict):
                self.pattern = p["pattern"].get("Regex", self.pattern)
            if p.get("type") in ("ByteLevel", "Metaspace"):
                self.add_prefix_space = bool(
                    p.get("add_prefix_space", False)
                    or p.get("prepend_scheme") in ("always", "first")
                )
        if self.byte_level:
            import regex

            self._re = regex.compile(self.pattern)
            self._b2u = _byte_to_unicode()
            self._u2b = {c: b for b, c in self._b2u.items()}
        self.byte_fallback = bool(model.get("byte_fallback", False)) or any(
            f"<0x{b:02X}>" in self.vocab for b in (0, 255)
        )
        if self.model_type == "Unigram":
            self.unk_id = self._uni_unk
            # Unigram exports pre-tokenize with Metaspace (or nothing but a
            # Replace-normalizer); treat non-byte-level as metaspace.
            if not self.byte_level:
                self.metaspace = True
        else:
            self.unk_id = (
                self.vocab.get(model["unk_token"])
                if model.get("unk_token") else None
            )

    # -- construction -------------------------------------------------------

    @classmethod
    def from_file(cls, path: str) -> "Tokenizer":
        with open(path, encoding="utf-8") as f:
            return cls(json.load(f))

    # -- encode -------------------------------------------------------------

    def _encode_word(self, symbols: list[int]) -> list[int]:
        return self._merger.merge(symbols)

    def _viterbi(self, s: str) -> list[int]:
        """Unigram max-score segmentation (SentencePiece Viterbi): dp over
        character positions; a position no piece reaches consumes one
        unknown character at min_score - 10. On backtrack, unknown runs
        become byte-fallback pieces (<0xNN>, when the vocab carries them)
        or unk_id tokens — consecutive unks fuse when the export set
        fuse_unk (the SentencePiece conversion default)."""
        n = len(s)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        best[0] = 0.0
        back: list = [None] * (n + 1)  # (start, token_id or None=unk)
        maxlen = self._uni_maxlen
        for j in range(1, n + 1):
            lo = max(0, j - maxlen)
            for i in range(lo, j):
                if best[i] == NEG:
                    continue
                rec = self._uni.get(s[i:j])
                if rec is None:
                    continue
                sc = best[i] + rec[1]
                if sc > best[j]:
                    best[j] = sc
                    back[j] = (i, rec[0])
            if best[j] == NEG and best[j - 1] != NEG:
                best[j] = best[j - 1] + self._unk_score
                back[j] = (j - 1, None)
        out: list = []  # reversed (id or ("unk", char)) items
        j = n
        while j > 0:
            i, tid = back[j]
            if tid is None:
                out.append(("unk", s[i:j]))
            else:
                out.append(tid)
            j = i
        out.reverse()
        ids: list[int] = []
        prev_unk = False
        for item in out:
            if isinstance(item, tuple):
                ch = item[1]
                fell_back = False
                if self.byte_fallback:
                    bts = ch.encode("utf-8")
                    names = [f"<0x{b:02X}>" for b in bts]
                    if all(nm in self.vocab for nm in names):
                        ids.extend(self.vocab[nm] for nm in names)
                        fell_back = True
                if not fell_back and self.unk_id is not None:
                    if not (self._fuse_unk and prev_unk):
                        ids.append(self.unk_id)
                    prev_unk = True
                    continue
                prev_unk = False
            else:
                ids.append(item)
                prev_unk = False
        return ids

    def _initial_symbols(self, piece: str) -> list[int]:
        """Map one pre-token to initial symbol ids (chars, with byte
        fallback for metaspace vocabularies)."""
        out = []
        for ch in piece:
            tid = self.vocab.get(ch)
            if tid is not None:
                out.append(tid)
                continue
            names = (
                [f"<0x{b:02X}>" for b in ch.encode("utf-8")]
                if self.byte_fallback else []
            )
            if names and all(nm in self.vocab for nm in names):
                out.extend(self.vocab[nm] for nm in names)
            elif self.unk_id is not None:
                out.append(self.unk_id)
            # else: drop (matches tokenizers' behavior without unk)
        return out

    def _encode_segment(self, text: str) -> list[int]:
        if not text:
            return []
        ids: list[int] = []
        if self.byte_level:
            for piece in self._re.findall(text):
                chars = "".join(self._b2u[b] for b in piece.encode("utf-8"))
                if self.model_type == "Unigram":
                    ids.extend(self._viterbi(chars))
                else:
                    ids.extend(self._encode_word(self._initial_symbols(chars)))
        else:  # metaspace
            t = text.replace(" ", _METASPACE)
            if self.add_prefix_space and not t.startswith(_METASPACE):
                t = _METASPACE + t
            if self.model_type == "Unigram":
                ids.extend(self._viterbi(t))
            else:
                ids.extend(self._encode_word(self._initial_symbols(t)))
        return ids

    def encode(self, text: str) -> list[int]:
        """Text -> token ids. Added/special tokens match verbatim first."""
        if not self.added:
            return self._encode_segment(text)
        import re as _stdre

        pat = "|".join(
            _stdre.escape(t)
            for t in sorted(self.added, key=len, reverse=True)
        )
        ids: list[int] = []
        last = 0
        for m in _stdre.finditer(pat, text):
            ids.extend(self._encode_segment(text[last : m.start()]))
            ids.append(self.added[m.group()])
            last = m.end()
        ids.extend(self._encode_segment(text[last:]))
        return ids

    # -- decode -------------------------------------------------------------

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        """Token ids -> text. Byte-producing tokens accumulate into ONE byte
        buffer decoded at the end, so multi-byte UTF-8 characters split
        across tokens (byte-level pieces, <0xNN> fallbacks) reassemble."""
        added_ids = set(self.added.values())
        buf = bytearray()
        for i in ids:
            i = int(i)
            if skip_special_tokens and i in self.special_ids:
                continue
            tok = self.id_to_token.get(i)
            if tok is None:
                continue
            if i in added_ids:
                buf += tok.encode("utf-8")
            elif self.byte_level:
                buf += bytes(self._u2b[c] for c in tok)
            elif tok.startswith("<0x") and tok.endswith(">") and len(tok) == 6:
                buf.append(int(tok[3:5], 16))
            else:
                buf += tok.replace(_METASPACE, " ").encode("utf-8")
        text = buf.decode("utf-8", errors="replace")
        if self.metaspace and self.add_prefix_space and text.startswith(" "):
            text = text[1:]
        return text
