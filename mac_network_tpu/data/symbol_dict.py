"""Bidirectional word <-> id vocabulary (reference: preprocess.py:56-152).

Special symbols pinned to fixed ids: <PAD>=0, <UNK>=1, <START>=2, <END>=3
(reference: preprocess.py:69-70).  Pickled to disk between runs.
"""

from __future__ import annotations

from typing import List, Optional


class SymbolDict:
    def __init__(self, empty: bool = False):
        self.padding = "<PAD>"
        self.unknown = "<UNK>"
        self.start = "<START>"
        self.end = "<END>"
        self.invalidSymbols = [self.padding, self.unknown, self.start, self.end]

        if empty:
            self.sym2id = {}
            self.id2sym: List[str] = []
        else:
            self.sym2id = {self.padding: 0, self.unknown: 1,
                           self.start: 2, self.end: 3}
            self.id2sym = [self.padding, self.unknown, self.start, self.end]
        self.allSeqs: List[str] = []

    def getNumSymbols(self) -> int:
        return len(self.sym2id)

    def isPadding(self, enc: int) -> bool:
        return enc == 0

    def isUnknown(self, enc: int) -> bool:
        return enc == 1

    def isStart(self, enc: int) -> bool:
        return enc == 2

    def isEnd(self, enc: int) -> bool:
        return enc == 3

    def isValid(self, enc: int) -> bool:
        return len(self.invalidSymbols) <= enc < self.getNumSymbols()

    def resetSeqs(self) -> None:
        self.allSeqs = []

    def addSeq(self, seq) -> None:
        self.allSeqs += seq

    def createVocab(self, minCount: int = 0) -> None:
        """Build the vocabulary from sequences accumulated via addSeq; a
        symbol must appear strictly more than minCount times
        (reference: preprocess.py:98-105)."""
        counter = {}
        for symbol in self.allSeqs:
            counter[symbol] = counter.get(symbol, 0) + 1
        for symbol in counter:
            if counter[symbol] > minCount and symbol not in self.sym2id:
                self.sym2id[symbol] = self.getNumSymbols()
                self.id2sym.append(symbol)

    def encodeSym(self, symbol: str) -> int:
        if symbol not in self.sym2id:
            symbol = self.unknown
        return self.sym2id[symbol]

    def encodeSequence(self, decoded: List[str], addStart: bool = False,
                       addEnd: bool = False, reverse: bool = False) -> List[int]:
        decoded = list(decoded)
        if reverse:
            decoded.reverse()
        if addStart:
            decoded = [self.start] + decoded
        if addEnd:
            decoded = decoded + [self.end]
        return [self.encodeSym(s) for s in decoded]

    def decodeId(self, enc: int) -> str:
        return self.id2sym[enc] if enc < self.getNumSymbols() else self.unknown

    def decodeSequence(self, encoded: List[int], delim: Optional[str] = None,
                       reverse: bool = False, stopAtInvalid: bool = True):
        """Decode ids, stopping at the first invalid symbol
        (reference: preprocess.py:137-152)."""
        length = 0
        for enc in encoded:
            if not self.isValid(enc) and stopAtInvalid:
                break
            length += 1
        decoded = [self.decodeId(enc) for enc in encoded[:length]]
        if reverse:
            decoded.reverse()
        if delim is not None:
            return delim.join(decoded)
        return decoded
