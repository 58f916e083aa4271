"""AI narrative with the reference's graceful-degrade contract
(etl/model.py:36-97): build the prompt from collected scalars, call the
chat client if one is configured, return an HTML error string otherwise —
never raise, never run inside an executor.
"""

from __future__ import annotations

MAX_NARRATIVE_WORDS = 120  # reference cap, etl/model.py:15

_CLIENT_ERROR = (
    "<p><b>Error:</b> LLM client is not configured. "
    "Set an API key to enable the narrative section.</p>"
)
_CALL_ERROR = "<p><b>Error:</b> narrative generation failed: {exc}</p>"


def _build_client():
    """OpenAI-compatible client if the lib + key are present, else None."""
    import os

    try:
        from openai import OpenAI  # optional dependency
    except ImportError:
        return None
    if not os.environ.get("OPENAI_API_KEY"):
        return None
    return OpenAI()


def truncate_words(text: str, max_words: int = MAX_NARRATIVE_WORDS) -> str:
    """Hard cap the narrative length (etl/model.py:28-34)."""
    words = text.split()
    if len(words) <= max_words:
        return text
    return " ".join(words[:max_words]) + "..."


def generate_narrative_analysis(
    inventory_summary: dict,
    financial_summary: dict,
    total_items: int,
    client=None,
) -> str:
    """Narrative paragraph over the run's headline KPIs.

    Degrades exactly like the reference: missing client -> error string
    (etl/model.py:40-42); API failure -> error string (etl/model.py:95-97).
    """
    client = client or _build_client()
    if client is None:
        return _CLIENT_ERROR

    total_items = total_items or 1
    dead = inventory_summary.get("total_dead_stock_items", 0)
    prompt = (
        "You are an expert business analyst. Write a VERY concise, "
        "impactful narrative (max 2 paragraphs, "
        f"{MAX_NARRATIVE_WORDS} words) over this warehouse data:\n"
        f"- Total inventory value: {financial_summary.get('total_inventory_value', 0):,.0f}\n"
        f"- Stock turnover ratio: {inventory_summary.get('stock_turnover_ratio', 0):.2f}\n"
        f"- Days of inventory on hand: {inventory_summary.get('days_of_inventory_on_hand', 0):.1f}\n"
        f"- Dead stock: {dead} SKUs ({dead / total_items * 100:.1f}%)\n"
        "Focus on ONE critical finding and ONE recommendation. "
        "Use <b> tags for emphasis and <br><br> between paragraphs."
    )
    try:
        completion = client.chat.completions.create(
            model="gpt-4o-mini",
            messages=[{"role": "user", "content": prompt}],
            max_tokens=400,
        )
        return truncate_words(completion.choices[0].message.content)
    except Exception as exc:  # any API failure -> embedded error, no raise
        return _CALL_ERROR.format(exc=exc)
