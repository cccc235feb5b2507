"""Cross-spec validation: unique FQNs, dependency existence, cycles.

These are the reference's run-global stateful validators re-created at
the spec level (they are metadata checks, so they stay driver-side
plain Python — SURVEY.md §2.2 V5 "no data-plane analogue"):

- UniqueFQNValidator (reference validator.py:183-223): FQN must be
  unique across all spec files in the run; first file wins, LATER
  files are flagged (validator.py:207-220); missing/non-string fqn is
  its own error (validator.py:192-205).
- DependencyValidator (validator.py:226-316): every path in
  depends_on / dependents must exist on disk; non-list[str] fields are
  type errors (validator.py:231-263).
- Circular-dependency check (validator.py:268-285): run-global
  digraph, ``graphlib.TopologicalSorter.prepare()`` raises CycleError.
"""

from __future__ import annotations

from graphlib import CycleError, TopologicalSorter
from pathlib import Path

from py_schemax_spark.specs.model import SpecError, SpecValidationResult


class SpecSetValidator:
    """Stateful cross-file validator — construct once per run, feed
    each loaded spec in order (mirrors validator instances persisting
    across the reference's per-file loop, rulesets.py:28-32)."""

    def __init__(self) -> None:
        self._fqn_to_file: dict[str, str] = {}
        self._graph: dict[str, set[str]] = {}

    @staticmethod
    def _node(path: str) -> str:
        """Graph nodes are resolved absolute paths — a cycle written
        with relative paths (CLI args) and absolute paths (depends_on
        values) must still close."""
        return str(Path(path).resolve())

    def validate_unique_fqn(self, result: SpecValidationResult) -> SpecValidationResult:
        """First occurrence wins; later duplicate files are flagged."""
        if result.spec is None:
            return result
        fqn = result.spec.fqn
        errors = list(result.errors)
        if fqn in self._fqn_to_file:
            errors.append(
                SpecError(
                    "duplicate_fqn",
                    "$.fqn",
                    f"FQN '{fqn}' already defined in "
                    f"'{self._fqn_to_file[fqn]}'.",
                )
            )
        else:
            self._fqn_to_file[fqn] = result.file_path
        if len(errors) > len(result.errors):
            return SpecValidationResult(
                file_path=result.file_path, valid=False,
                errors=tuple(errors), spec=result.spec,
            )
        return result

    def validate_dependencies(
        self, result: SpecValidationResult
    ) -> SpecValidationResult:
        """Each depends_on / dependents path must exist on disk; also
        feeds the run-global digraph for the cycle check."""
        if result.spec is None:
            return result
        errors = list(result.errors)
        spec = result.spec
        me = self._node(result.file_path)
        self._graph.setdefault(me, set())
        for field in ("depends_on", "dependents"):
            for i, dep in enumerate(getattr(spec, field)):
                dep_node = self._node(dep)
                if field == "depends_on":
                    self._graph[me].add(dep_node)
                else:
                    self._graph.setdefault(dep_node, set()).add(me)
                if not Path(dep).is_file():
                    errors.append(
                        SpecError(
                            "file_not_found",
                            f"$.{field}[{i}]",
                            f"Dependency '{dep}' does not exist.",
                        )
                    )
        if len(errors) > len(result.errors):
            return SpecValidationResult(
                file_path=result.file_path, valid=False,
                errors=tuple(errors), spec=spec,
            )
        return result

    def validate_no_cycles(self) -> list[SpecError]:
        """Run-global: call once after all files are fed."""
        try:
            TopologicalSorter(self._graph).prepare()
        except CycleError as exc:
            cycle = exc.args[1] if len(exc.args) > 1 else []
            return [
                SpecError(
                    "circular_dependency",
                    "$.depends_on",
                    "Circular dependency detected: "
                    + " -> ".join(map(str, cycle)),
                )
            ]
        return []
