"""ValidationReport / ValidationResult.

Behavioral reference: /root/reference/src/validation-report.js:22-89 — the
report exposes conforms() and per-result accessors focusNode/severity/
sourceShape/sourceConstraintComponent/path/message/value.  Severity is
reported as the local name after '#' (validation-report.js + the test
harness's ExpectedValidationResult.severity()).
"""

from __future__ import annotations

from dataclasses import dataclass

from .terms import Term


@dataclass
class ValidationResult:
    focus: Term | None
    value: Term | None
    path: Term | None
    component: str        # constraint component IRI
    severity: str         # severity IRI
    source_shape: Term | None
    message: str | None

    def focusNode(self) -> str | None:
        return self.focus.value if self.focus else None

    def severity_local(self) -> str | None:
        return self.severity.split("#")[1] if self.severity and "#" in self.severity else self.severity

    def sourceConstraintComponent(self) -> str:
        return self.component

    def sourceShape(self) -> str | None:
        return self.source_shape.value if self.source_shape else None

    def resultPath(self) -> str | None:
        return self.path.value if self.path else None

    def resultMessage(self) -> str | None:
        return self.message


class ValidationReport:
    def __init__(self, results: list[ValidationResult]):
        self._results = results

    def conforms(self) -> bool:
        return len(self._results) == 0

    def results(self) -> list[ValidationResult]:
        return self._results

    def __repr__(self) -> str:
        return f"ValidationReport(conforms={self.conforms()}, results={len(self._results)})"
