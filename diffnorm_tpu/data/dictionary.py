"""Symbol dictionary with fairseq-compatible special-token layout.

Parity-critical: the reference maps bos=0 '<s>', pad=1 '<pad>', eos=2 '</s>',
unk=3 '<unk>' and appends unit symbols after, so unit k gets index k+4
(reference: fairseq/data/dictionary.py:21-46; unit offset usage
fairseq/models/text_to_speech/latent_module.py:1451, research/TranSpeech/nat_gen.py:61).
The speech-unit dictionaries are built as the integers 0..K-1 as strings
(reference: fairseq/tasks/speech_decoder_task.py:137-142 builds size 1000+4=1004).
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import numpy as np


class Dictionary:
    def __init__(
        self,
        bos: str = "<s>",
        pad: str = "<pad>",
        eos: str = "</s>",
        unk: str = "<unk>",
        extra_special_symbols: Optional[Iterable[str]] = None,
    ):
        self.symbols: List[str] = []
        self.count: List[int] = []
        self.indices = {}
        self.bos_word, self.pad_word, self.eos_word, self.unk_word = bos, pad, eos, unk
        self.bos_index = self.add_symbol(bos)
        self.pad_index = self.add_symbol(pad)
        self.eos_index = self.add_symbol(eos)
        self.unk_index = self.add_symbol(unk)
        for s in extra_special_symbols or []:
            self.add_symbol(s)
        self.nspecial = len(self.symbols)

    # -- core ---------------------------------------------------------------
    def add_symbol(self, word: str, n: int = 1) -> int:
        if word in self.indices:
            idx = self.indices[word]
            self.count[idx] += n
            return idx
        idx = len(self.symbols)
        self.indices[word] = idx
        self.symbols.append(word)
        self.count.append(n)
        return idx

    def index(self, sym: str) -> int:
        return self.indices.get(sym, self.unk_index)

    def __getitem__(self, idx: int) -> str:
        if 0 <= idx < len(self.symbols):
            return self.symbols[idx]
        return self.unk_word

    def __len__(self) -> int:
        return len(self.symbols)

    def __eq__(self, other) -> bool:
        return isinstance(other, Dictionary) and self.indices == other.indices

    def bos(self) -> int:
        return self.bos_index

    def pad(self) -> int:
        return self.pad_index

    def eos(self) -> int:
        return self.eos_index

    def unk(self) -> int:
        return self.unk_index

    # -- encode/decode ------------------------------------------------------
    def encode_line(
        self,
        line: str,
        append_eos: bool = True,
        add_if_not_exist: bool = False,
    ) -> np.ndarray:
        words = line.split()
        ids = []
        for w in words:
            if add_if_not_exist:
                ids.append(self.add_symbol(w))
            else:
                ids.append(self.index(w))
        if append_eos:
            ids.append(self.eos_index)
        return np.asarray(ids, dtype=np.int32)

    def string(
        self,
        tensor,
        remove_special: bool = True,
    ) -> str:
        ids = np.asarray(tensor).reshape(-1)
        toks = []
        for i in ids:
            i = int(i)
            if remove_special and i < self.nspecial:
                continue
            toks.append(self[i])
        return " ".join(toks)

    # -- IO -----------------------------------------------------------------
    def save(self, path: str):
        with open(path, "w") as f:
            for sym, cnt in zip(
                self.symbols[self.nspecial:], self.count[self.nspecial:]
            ):
                f.write(f"{sym} {cnt}\n")

    @classmethod
    def load(cls, path: str) -> "Dictionary":
        d = cls()
        with open(path) as f:
            for line in f:
                line = line.rstrip()
                if not line:
                    continue
                if " " in line:
                    sym, cnt = line.rsplit(" ", 1)
                    try:
                        cnt = int(cnt)
                    except ValueError:
                        sym, cnt = line, 1
                else:
                    sym, cnt = line, 1
                d.add_symbol(sym, n=cnt)
        return d

    @classmethod
    def unit_dictionary(cls, num_units: int) -> "Dictionary":
        """Dictionary of speech units 0..num_units-1; len == num_units + 4."""
        d = cls()
        for u in range(num_units):
            d.add_symbol(str(u))
        return d
