"""Deterministic generator for the reference's native data model.

Plays the role of the reference's mock generators (test/MockData.java:26-183 —
which are random and UNSEEDED; ours is seeded so golden tests are stable).
Row shapes and value domains mirror the reference's rules (SURVEY §1.2,
FIXTURES.md): one action-type column group non-null per row, comma-joined id
lists, string timestamps 'yyyy-MM-dd HH:mm:ss'.

Driver-side generation is deliberate: this is a test fixture factory (the
reference's is too), not a production source. Production data arrives through
sources.catalog.
"""

from __future__ import annotations

import random
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CITY_INFO, PRODUCT_INFO, USER_INFO, USER_VISIT_ACTION

SEARCH_KEYWORDS = [
    "hotpot", "cellphone", "laptop", "novel", "headphones",
    "sneakers", "jacket", "camera", "monitor", "keyboard",
]
ACTIONS = ["search", "click", "order", "pay"]
AREAS = ["East", "North", "South", "Central", "Northwest", "Southwest", "Northeast"]


def mock_user_visit_data(
    spark: SparkSession,
    n_users: int = 100,
    sessions_per_user: int = 10,
    max_actions_per_session: int = 30,
    n_products: int = 100,
    n_cities: int = 10,
    dates: tuple[str, ...] = ("2018-12-01", "2018-12-02", "2018-12-03"),
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Generate the four reference tables with the reference's invariants."""
    rng = random.Random(seed)

    actions = []
    for uid in range(n_users):
        for _ in range(sessions_per_user):
            session_id = uuid.UUID(int=rng.getrandbits(128)).hex
            date = rng.choice(dates)
            base_hour = rng.randint(0, 22)
            # fixed category per session (MockData.java:66-68)
            session_category = rng.randint(0, 99)
            for _ in range(rng.randint(1, max_actions_per_session)):
                t = f"{date} {base_hour:02d}:{rng.randint(0, 58):02d}:{rng.randint(0, 58):02d}"
                action = rng.choice(ACTIONS)
                kw = cat = prod = None
                order_cats = order_prods = pay_cats = pay_prods = None
                if action == "search":
                    kw = rng.choice(SEARCH_KEYWORDS)
                elif action == "click":
                    cat = session_category
                    prod = rng.randint(0, n_products - 1)
                elif action == "order":
                    order_cats = ",".join(
                        str(rng.randint(0, 99)) for _ in range(rng.randint(1, 3))
                    )
                    order_prods = ",".join(
                        str(rng.randint(0, n_products - 1))
                        for _ in range(rng.randint(1, 3))
                    )
                else:
                    pay_cats = ",".join(
                        str(rng.randint(0, 99)) for _ in range(rng.randint(1, 3))
                    )
                    pay_prods = ",".join(
                        str(rng.randint(0, n_products - 1))
                        for _ in range(rng.randint(1, 3))
                    )
                actions.append(
                    (
                        date, uid, session_id, rng.randint(0, 9), t,
                        kw, cat, prod,
                        order_cats, order_prods, pay_cats, pay_prods,
                        rng.randint(0, n_cities - 1),
                    )
                )

    users = [
        (
            uid, f"user{uid}", f"name{uid}", rng.randint(16, 60),
            f"professional{rng.randint(0, 99)}", f"city{rng.randint(0, 9)}",
            rng.choice(["male", "female"]),
        )
        for uid in range(n_users)
    ]
    products = [
        (pid, f"product{pid}", '{"product_status": %d}' % rng.randint(0, 1))
        for pid in range(n_products)
    ]
    cities = [
        (cid, f"city{cid}", AREAS[cid % len(AREAS)]) for cid in range(n_cities)
    ]

    return {
        "user_visit_action": spark.createDataFrame(actions, USER_VISIT_ACTION),
        "user_info": spark.createDataFrame(users, USER_INFO),
        "product_info": spark.createDataFrame(products, PRODUCT_INFO),
        "city_info": spark.createDataFrame(cities, CITY_INFO),
    }
