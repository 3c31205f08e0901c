"""Declarative query surface: oracle SQL registry and plan inspection."""
