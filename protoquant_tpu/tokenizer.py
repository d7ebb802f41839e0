"""Byte-level BPE tokenizer loading HuggingFace ``tokenizer.json`` files.

Serving-surface component beyond the reference's scope (the reference has
no text tier at all): turns the HTTP/CLI boundary from token ids into text.
From-scratch implementation — the JSON parsing, byte-level mapping and
pre-tokenization live here; the per-word merge loop is the native C++
``BpeMerger`` (protoquant_tpu/native/pq_bpe.cpp, pure-Python fallback).

Supported tokenizer.json shapes (the two families the model zoo uses):
  * byte-level BPE (GPT-2 / Llama-3 / Qwen): ByteLevel pre-tokenizer with a
    split regex, byte->unicode table, ByteLevel decoder;
  * metaspace BPE (Llama-2 / Mistral SentencePiece exports): whitespace
    replaced by ▁ with prefix insertion, byte-fallback <0xNN> tokens.

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
        if model.get("type") != "BPE":
            raise ValueError(f"unsupported tokenizer model {model.get('type')!r}")
        self.vocab: dict[str, int] = model["vocab"]
        self.id_to_token = {i: t for t, i in self.vocab.items()}
        merges = []
        for m in model.get("merges", []):
            a, b = m if isinstance(m, (list, tuple)) else m.split(" ", 1)
            merges.append((self.vocab[a], self.vocab[b], self.vocab[a + b]))
        from .native import BpeMerger

        self._merger = BpeMerger(merges)

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
        self.byte_fallback = any(
            f"<0x{b:02X}>" in self.vocab for b in (0, 255)
        )
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

    def _initial_symbols(self, piece: str) -> list[int]:
        """Map one pre-token to initial symbol ids (chars, with byte
        fallback for metaspace vocabularies)."""
        out = []
        for ch in piece:
            tid = self.vocab.get(ch)
            if tid is not None:
                out.append(tid)
            elif self.byte_fallback:
                out.extend(
                    self.vocab[f"<0x{b:02X}>"] for b in ch.encode("utf-8")
                )
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
                ids.extend(self._encode_word(self._initial_symbols(chars)))
        else:  # metaspace
            t = text.replace(" ", _METASPACE)
            if self.add_prefix_space and not t.startswith(_METASPACE):
                t = _METASPACE + t
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
