"""Model integrations: DiT (CogVideoX-class) and LLM decode path."""
