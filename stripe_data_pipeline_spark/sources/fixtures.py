"""Deterministic Stripe-shaped NDJSON fixtures (FIXTURES.md §A).

Generates raw invoices/subscriptions/events covering every edge case
the reference's model branches handle: null period.end, zero-length
period, empty taxes, inclusive vs exclusive tax, non-USD currency,
multi-line invoices, duplicate re-delivery (FIXTURES.md §A1 list).
"""

from __future__ import annotations

import json
import os
import random

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z
DAY = 86400

CURRENCIES = ("usd", "eur", "gbp")


def make_invoice(i: int, rng: random.Random) -> dict:
    created = EPOCH_2024 + i * 3600
    currency = CURRENCIES[i % 3]
    n_lines = 1 + i % 3  # multi-line fan-out
    lines = []
    for j in range(n_lines):
        period_start = created + j * DAY
        case = (i + j) % 5
        if case == 0:  # plain 30-day period, exclusive tax
            period_end = period_start + 30 * DAY
            taxes = [{"amount": 100 + j, "tax_behavior": "exclusive"}]
        elif case == 1:  # inclusive tax
            period_end = period_start + 10 * DAY
            taxes = [{"amount": 200 + j, "tax_behavior": "inclusive"}]
        elif case == 2:  # missing period end (fallback branch)
            period_end = None
            taxes = []
        elif case == 3:  # zero-length period (division guard)
            period_end = period_start
            taxes = [{"amount": 50, "tax_behavior": "exclusive"}]
        else:  # empty taxes (COALESCE branch)
            period_end = period_start + 7 * DAY
            taxes = []
        lines.append(
            {
                "id": f"il_{i}_{j}",
                "type": "subscription" if j == 0 else "invoiceitem",
                "description": f"line {j}",
                "amount": 1000 + 137 * ((i + j) % 97),
                "currency": currency,
                "quantity": 1 + j,
                "subscription": f"sub_{i % 20}",
                "period": {"start": period_start, "end": period_end},
                "taxes": taxes,
                "metadata": {"k": str(j)},
            }
        )
    total = sum(li["amount"] for li in lines)
    return {
        "id": f"in_{i}",
        "customer": f"cus_{i % 37}",
        "subscription": f"sub_{i % 20}",
        "created": created,
        "status": "paid" if i % 7 else "open",  # P3 filter exercises
        "currency": currency,
        "amount_due": total,
        "amount_paid": total if i % 7 else 0,
        "amount_remaining": 0 if i % 7 else total,
        "subtotal": total,
        "total": total,
        "tax": sum(t["amount"] for li in lines for t in li["taxes"]),
        "automatic_tax": json.dumps({"enabled": bool(i % 2)}),
        "collection_method": "charge_automatically",
        "period_start": created,
        "period_end": created + 30 * DAY,
        "metadata": {"batch": str(i // 10)},
    } | {"lines": {"data": lines}}


def make_subscription(i: int) -> dict:
    return {
        "id": f"sub_{i}",
        "created": EPOCH_2024 + i * DAY,
        "status": "active" if i % 4 else "canceled",
        "customer": f"cus_{i % 37}",
        "metadata": {},
    }


def make_subscription_event(i: int) -> dict:
    return {
        "id": f"evt_{i}",
        "created": EPOCH_2024 + i * 1800,
        "type": "customer.subscription.updated",
        "data": json.dumps({"object": {"id": f"sub_{i % 20}", "status": "active"}}),
    }


def write_fixture(
    raw_dir: str, n_invoices: int = 50, seed: int = 7, duplicate_every: int = 10
) -> dict[str, str]:
    """Write NDJSON drops (one file per resource, S3 overwrite
    semantics). Every ``duplicate_every``-th invoice is re-delivered
    verbatim — the MERGE-idempotency fixture."""
    rng = random.Random(seed)
    os.makedirs(raw_dir, exist_ok=True)
    paths = {}

    inv_path = os.path.join(raw_dir, "invoices.json")
    with open(inv_path, "w") as f:
        for i in range(n_invoices):
            doc = make_invoice(i, rng)
            f.write(json.dumps(doc) + "\n")
            if duplicate_every and i % duplicate_every == 0:
                f.write(json.dumps(doc) + "\n")  # duplicate re-delivery
    paths["invoices"] = inv_path

    sub_path = os.path.join(raw_dir, "subscriptions.json")
    with open(sub_path, "w") as f:
        for i in range(20):
            f.write(json.dumps(make_subscription(i)) + "\n")
    paths["subscriptions"] = sub_path

    ev_path = os.path.join(raw_dir, "subscription_updates.json")
    with open(ev_path, "w") as f:
        for i in range(100):
            f.write(json.dumps(make_subscription_event(i)) + "\n")
    paths["subscription_updates"] = ev_path
    return paths
