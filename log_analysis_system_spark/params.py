"""Task parameters — the reference's query IR.

A "query" in the reference is a row of the MySQL ``task`` table whose
``task_param`` JSON parameterizes a hard-coded job (reference:
dao/impl/TaskDAOImpl.java:16-52, util/ParamUtils.java:20-49,
constant/Constants.java:82-91; each value is a single-element JSON array).
Here that becomes a typed dataclass bound to parameterized query functions.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class TaskParams:
    """Typed equivalent of the reference's task_param JSON document."""

    start_date: str | None = None  # yyyy-MM-dd, inclusive
    end_date: str | None = None  # yyyy-MM-dd, inclusive
    start_age: int | None = None
    end_age: int | None = None
    professionals: list[str] = field(default_factory=list)
    cities: list[str] = field(default_factory=list)
    sex: str | None = None
    keywords: list[str] = field(default_factory=list)
    category_ids: list[int] = field(default_factory=list)
    target_page_flow: list[int] = field(default_factory=list)

    @classmethod
    def from_json(cls, doc: str) -> "TaskParams":
        """Parse the reference encoding: every value is a 1-element JSON array
        of strings, list-valued params comma-joined inside that one string
        (util/ParamUtils.java:43-48)."""
        raw = json.loads(doc)

        def one(key: str) -> str | None:
            v = raw.get(key)
            return v[0] if v else None

        def many(key: str) -> list[str]:
            v = one(key)
            return v.split(",") if v else []

        return cls(
            start_date=one("startDate"),
            end_date=one("endDate"),
            start_age=int(one("startAge")) if one("startAge") else None,
            end_age=int(one("endAge")) if one("endAge") else None,
            professionals=many("professionals"),
            cities=many("cities"),
            sex=one("sex"),
            keywords=many("keywords"),
            category_ids=[int(x) for x in many("categoryIds")],
            target_page_flow=[int(x) for x in many("targetPageFlow")],
        )
