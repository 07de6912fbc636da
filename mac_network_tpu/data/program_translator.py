"""CLEVR functional-program translation (reference: program_translator.py).

Converts tree-structured CLEVR programs into postfix token sequences for
length bucketing, filtering and breakdown analysis — never a model input
(SURVEY.md §2).
"""

from __future__ import annotations

from typing import Dict, List


class ProgramTranslator:
    def __init__(self, programDict, maxArity: int):
        self.programDict = programDict
        self.maxArity = maxArity
        self.maxStack = 0

    def functionToKey(self, function: Dict, withValInputs: bool = True) -> str:
        """'{arity}_{function}_{value_inputs}' key; single-word function
        names are doubled (reference: program_translator.py:9-15)."""
        valInputs = ""
        if withValInputs:
            valInputs = "_" + ",".join(function["value_inputs"])
        functionKey = function["function"] if "_" in function["function"] else \
            "_".join([function["function"], function["function"]])
        return str(len(function["inputs"])) + "_" + functionKey + valInputs

    def keyToFunction(self, key: str):
        """Inverse of functionToKey (reference: program_translator.py:17-27)."""
        assert key not in self.programDict.invalidSymbols
        parts = key.split("_")
        arity = int(parts[0])
        function = {
            "function": "_".join([parts[1], parts[2]]),
            "value_inputs": parts[3].split(",") if len(parts) == 4 else [],
            "inputs": [],
        }
        return function, arity

    def keyToArity(self, key: str) -> int:
        if key in self.programDict.invalidSymbols:
            return 0
        return int(key.split("_")[0])

    def keyToType(self, key: str) -> List[str]:
        if key in self.programDict.invalidSymbols:
            return ["0", "0", "0"]
        parts = key.split("_")
        return ["0:" + parts[0], "1:" + parts[1], "2:" + parts[2]]

    def programToPostfixProgram(self, program: List[Dict]) -> List[Dict]:
        """Recursive postfix reorder starting from the root (last function);
        rewrites each node's input indices to postfix positions
        (reference: program_translator.py:39-53)."""
        newProgram: List[Dict] = []

        def aux(currIndex: int = -1) -> None:
            childrenIndices = program[currIndex]["inputs"]
            childrenNewIndices = []
            for child in childrenIndices:
                aux(child)
                childrenNewIndices.append(len(newProgram) - 1)
            program[currIndex]["inputs"] = childrenNewIndices
            newProgram.append(program[currIndex])

        aux()
        return newProgram

    def programToSeq(self, program: List[Dict]) -> List[str]:
        return [self.functionToKey(f) for f in program]

    def programToInputs(self, program: List[Dict], offset: int = 0) -> List[List[int]]:
        return [[i + offset for i in f["inputs"]] for f in program]
