"""Text-analysis operators over ``documents`` (extension surface). Filled in
incrementally; see operators/text.py for the implementation."""
