"""CLI script tree (reference api/ layout; see pyproject entry points)."""
