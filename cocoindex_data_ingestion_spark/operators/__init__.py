"""Operator library (reference: app/services/*, src/ops/functions/*)."""
