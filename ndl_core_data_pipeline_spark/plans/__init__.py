from .audit import audit_plan, explain_formatted, plan_report

__all__ = ["audit_plan", "explain_formatted", "plan_report"]
