"""NeuralEngine: DAG-of-hooks inference pipeline.

Parity: pytorchvideo/neural_engine/engine.py:11-77 — hooks are topologically
sorted by their declared input/output names (networkx DiGraph) and executed
against a shared status dict.
"""

from __future__ import annotations

import itertools
from collections import OrderedDict
from typing import List, Union

import networkx as nx

from pytorchvideo_tpu.engine.hook import HookBase


class NeuralEngine:
    """Executes hooks in dependency order over a status dict."""

    def __init__(self, hooks: List[HookBase]) -> None:
        self.hooks = hooks
        self.execution_order_func = NeuralEngine.topological_sort

    def get_execution_order(self, status):
        return self.execution_order_func(status, self.hooks)

    def set_execution_order_func(self, func):
        self.execution_order_func = func

    @staticmethod
    def topological_sort(status, hooks):
        graph = nx.DiGraph()
        edges = []
        pending_outputs = []
        output_to_hook = {}
        for hook in hooks:
            for pair in itertools.product(hook.get_inputs(), hook.get_outputs()):
                edges.append(pair)
            for output in hook.get_outputs():
                assert output not in pending_outputs, f"duplicate output {output}"
                output_to_hook[output] = hook
                pending_outputs.append(output)
        graph.add_edges_from(edges)
        for current in nx.topological_sort(graph):
            if current in pending_outputs:
                hook = output_to_hook[current]
                yield hook
                for hook_out in hook.get_outputs():
                    pending_outputs.remove(hook_out)
            else:
                assert current in status, f"missing pipeline input {current}"
        assert len(pending_outputs) == 0

    def run(self, status: OrderedDict):
        for hook in self.get_execution_order(status):
            status.update(hook.run(status))
        return status

    def __enter__(self):
        return self

    def __exit__(self, type, value, traceback):
        pass

    def __call__(self, status: Union[OrderedDict, str]):
        if isinstance(status, str):
            status = {"path": status}
        return self.run(status)
