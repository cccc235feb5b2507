"""Result rendering + exit control (SURVEY.md §2.1 S8/S9, §2.3 C2/C3).

Mirrors the reference's Output (py_schemax/output.py:17-65):
- text mode: one ✅/❌ line per partition (the reference prints one per
  file), violations detail in verbose mode
- json mode: JSON-lines, one object per partition + a run-summary line
- levels: silent (exit codes only) / quiet (failures only) / verbose
  (everything) — reference config.py:12-15, output.py:37-53
- end_control: exit 1 iff any invalid and fail_mode ∈ {after, fast}
  (reference output.py:55-65)
"""

from __future__ import annotations

import json
import sys
from typing import IO, Optional

from py_schemax_spark.runner import RunResult


class Output:
    def __init__(
        self,
        output_format: str = "text",
        output_level: str = "quiet",
        stream: Optional[IO] = None,
    ):
        self.format = output_format
        self.level = output_level
        self.stream = stream or sys.stdout

    def _emit(self, s: str) -> None:
        print(s, file=self.stream)

    def print_result(self, result: RunResult, max_examples: int = 10) -> None:
        if self.level == "silent":
            return
        if self.format == "json":
            self._print_json(result, max_examples)
        else:
            self._print_text(result, max_examples)

    def _print_text(self, result: RunResult, max_examples: int) -> None:
        for err in result.schema_errors:
            self._emit(f"❌ schema: {err['error_at']}: {err['message']}")
        for r in result.summary_rows:
            if r["valid"] and self.level != "verbose":
                continue
            icon = "✅" if r["valid"] else "❌"
            self._emit(
                f"{icon} part={r['part']} rows={r['row_count']} "
                f"violations={r['violation_count']}"
            )
        if result.run_summary.suppressed_parts:
            self._emit(
                f"… and {result.run_summary.suppressed_parts} more "
                "partition(s) not shown (run totals below cover them)"
            )
        for d in result.drift:
            if d["drifted"] or self.level == "verbose":
                icon = "❌" if d["drifted"] else "✅"
                psi = f"{d['psi']:.4f}" if d.get("psi") is not None else "n/a"
                ks = f"{d['ks']:.4f}" if d.get("ks") is not None else "n/a"
                self._emit(f"{icon} drift {d['column']}: psi={psi} ks={ks}")
        if self.level == "verbose" and result.violations is not None:
            for row in result.violations.limit(max_examples).collect():
                d = row.asDict()
                self._emit(f"  ↳ {json.dumps(d, default=str)}")
        s = result.run_summary
        icon = "✅" if s.valid and not result.schema_errors else "❌"
        self._emit(
            f"{icon} run: {s.valid_partitions}/{s.total_partitions} partitions "
            f"valid, {s.total_violations} violations over {s.total_rows} rows"
        )

    def _print_json(self, result: RunResult, max_examples: int) -> None:
        for err in result.schema_errors:
            self._emit(json.dumps({"kind": "schema_error", **err}))
        for r in result.summary_rows:
            if r["valid"] and self.level != "verbose":
                continue
            self._emit(
                json.dumps(
                    {
                        "kind": "partition",
                        "part": str(r["part"]),
                        "valid": bool(r["valid"]),
                        "row_count": r["row_count"],
                        "violation_count": r["violation_count"],
                    }
                )
            )
        if result.run_summary.suppressed_parts:
            self._emit(
                json.dumps(
                    {
                        "kind": "partitions_suppressed",
                        "count": result.run_summary.suppressed_parts,
                    }
                )
            )
        for d in result.drift:
            if d["drifted"] or self.level == "verbose":
                self._emit(json.dumps({"kind": "drift", **d}, default=str))
        if self.level == "verbose" and result.violations is not None:
            for row in result.violations.limit(max_examples).collect():
                self._emit(
                    json.dumps(
                        {"kind": "violation", **row.asDict()}, default=str
                    )
                )
        self._emit(
            json.dumps({"kind": "summary", **result.run_summary.to_dict()})
        )

    def end_control(self, result: RunResult, fail_mode: str) -> int:
        """Exit-code decision (reference output.py:55-65): NEVER always
        exits 0 (with a stderr notice when invalid, output.py:58-61)."""
        if fail_mode == "never":
            if result.exit_code != 0 or not result.run_summary.valid:
                print(
                    "validation failed (exit suppressed by fail_mode=never)",
                    file=sys.stderr,
                )
            return 0
        return result.exit_code
