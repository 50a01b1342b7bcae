"""Driver-facing query modules. Importing a module registers its queries."""
