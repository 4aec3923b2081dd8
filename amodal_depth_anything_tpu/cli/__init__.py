"""CLI entry points with reference-compatible contracts:
`infer`, `train`, `eval`, `app` (Gradio demo)."""
