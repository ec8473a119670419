#!/usr/bin/env python3
"""One-shot builder for the round-16 pos_gold.tsv extension.

Input: SENTENCES below, builder-authored held-out prose annotated
word_TAG per token (Petrov universal tagset, following the repo's
closed-class conventions — e.g. 'to' is always PRT, possessive
pronouns are PRON, 'down/up/back' are PRT).

The script VALIDATES every annotation against the conventions the
existing gold file pins (closed-class lexicon words must carry their
lexicon tag; pure punctuation must be '.'; digit tokens must be NUM)
and appends the token/tag pairs to fixtures/pos_gold.tsv. Keeping the
source here makes the extension reproducible and reviewable; it is NOT
tuned to the tagger — sentences were written as natural text first and
tagged second (the validator only enforces the closed-class
conventions, which are definitional, not accuracy-flattering).
"""
import re, sys

LEXICON = {}
for tag, words in {
    "DET": "the a an this that these those each every some any no all both either neither another such",
    "PRON": "i you he she it we they me him her us them my your his its our their mine yours hers ours theirs myself yourself himself herself itself ourselves themselves who whom whose which what something anything nothing everything someone anyone everyone",
    "ADP": "of in for with on at by from about into over under between through during against among within without before after above below near behind beside",
    "CONJ": "and or but nor so yet because although while if when than as until unless since whether though",
    "VERB": "is are was were be been being am do does did doing have has had having will would can could shall should may might must get got gets make made makes go went gone goes see saw seen says said know knew think thought take took come came want wanted give gave feel felt seem seemed look looked",
    "ADV": "not very really too also just never always often sometimes quite rather almost already still again perhaps maybe however then there here now even only more most much well",
    "PRT": "to n't 's up out off down away back",
    "NUM": "one two three four five six seven eight nine ten zero hundred thousand million billion first second third",
}.items():
    for w in words.split():
        LEXICON[w] = tag

SENTENCES = """
A_DET cold_ADJ wind_NOUN pushed_VERB the_DET last_ADJ leaves_NOUN across_ADP the_DET empty_ADJ square_NOUN ._.
Nobody_NOUN expected_VERB the_DET bridge_NOUN to_PRT close_VERB before_ADP winter_NOUN ._.
The_DET council_NOUN voted_VERB on_ADP Tuesday_NOUN ,_. and_CONJ the_DET decision_NOUN surprised_VERB everyone_PRON ._.
Engineers_NOUN measured_VERB the_DET river_NOUN twice_ADV because_CONJ the_DET first_NUM reading_NOUN looked_VERB wrong_ADJ ._.
Her_PRON brother_NOUN fixes_VERB radios_NOUN in_ADP a_DET small_ADJ shop_NOUN behind_ADP the_DET station_NOUN ._.
He_PRON charges_VERB very_ADV little_ADJ ,_. so_CONJ customers_NOUN keep_VERB coming_VERB back_PRT ._.
On_ADP most_ADV mornings_NOUN the_DET bakery_NOUN sells_VERB out_PRT before_ADP nine_NUM ._.
Fresh_ADJ bread_NOUN costs_VERB two_NUM euros_NOUN ,_. and_CONJ the_DET rolls_NOUN cost_VERB less_ADJ ._.
A_DET gray_ADJ cat_NOUN slept_VERB under_ADP the_DET wooden_ADJ bench_NOUN near_ADP the_DET gate_NOUN ._.
Children_NOUN chased_VERB pigeons_NOUN while_CONJ their_PRON parents_NOUN drank_VERB coffee_NOUN ._.
The_DET museum_NOUN unveiled_VERB a_DET new_ADJ wing_NOUN for_ADP modern_ADJ sculpture_NOUN ._.
Critics_NOUN praised_VERB the_DET lighting_NOUN but_CONJ disliked_VERB the_DET narrow_ADJ corridors_NOUN ._.
Visitors_NOUN must_VERB leave_VERB large_ADJ bags_NOUN at_ADP the_DET entrance_NOUN ._.
Our_PRON train_NOUN left_VERB the_DET tunnel_NOUN and_CONJ climbed_VERB slowly_ADV into_ADP the_DET hills_NOUN ._.
Snow_NOUN covered_VERB the_DET upper_ADJ slopes_NOUN ,_. though_CONJ the_DET valley_NOUN stayed_VERB green_ADJ ._.
We_PRON reached_VERB the_DET village_NOUN after_ADP dark_NOUN and_CONJ found_VERB the_DET inn_NOUN closed_ADJ ._.
An_DET old_ADJ farmer_NOUN offered_VERB us_PRON soup_NOUN and_CONJ a_DET warm_ADJ room_NOUN ._.
His_PRON stories_NOUN lasted_VERB until_CONJ midnight_NOUN ._.
The_DET committee_NOUN reviewed_VERB nine_NUM proposals_NOUN during_ADP the_DET long_ADJ session_NOUN ._.
Three_NUM failed_VERB immediately_ADV for_ADP missing_ADJ signatures_NOUN ._.
The_DET rest_NOUN moved_VERB forward_ADV to_PRT a_DET public_ADJ hearing_NOUN ._.
Lawyers_NOUN argued_VERB about_ADP the_DET wording_NOUN of_ADP the_DET second_NUM clause_NOUN ._.
A_DET final_ADJ draft_NOUN appeared_VERB on_ADP Friday_NOUN ,_. and_CONJ the_DET mayor_NOUN signed_VERB it_PRON ._.
Rain_NOUN fell_VERB steadily_ADV through_ADP the_DET afternoon_NOUN ._.
Water_NOUN pooled_VERB in_ADP the_DET parking_NOUN lot_NOUN and_CONJ crept_VERB toward_ADP the_DET doors_NOUN ._.
Workers_NOUN stacked_VERB sandbags_NOUN along_ADP the_DET loading_NOUN dock_NOUN ._.
By_ADP evening_NOUN the_DET storm_NOUN weakened_VERB ,_. and_CONJ the_DET crews_NOUN went_VERB home_ADV ._.
The_DET laboratory_NOUN published_VERB its_PRON results_NOUN in_ADP a_DET short_ADJ paper_NOUN ._.
The_DET experiment_NOUN used_VERB a_DET cheap_ADJ sensor_NOUN and_CONJ a_DET borrowed_ADJ telescope_NOUN ._.
Measurements_NOUN continued_VERB for_ADP six_NUM weeks_NOUN without_ADP interruption_NOUN ._.
The_DET signal_NOUN appeared_VERB weak_ADJ at_ADP first_NUM but_CONJ grew_VERB clearer_ADJ each_DET night_NOUN ._.
Reviewers_NOUN asked_VERB for_ADP raw_ADJ data_NOUN ,_. and_CONJ the_DET team_NOUN released_VERB everything_PRON ._.
A_DET rival_ADJ group_NOUN confirmed_VERB the_DET finding_NOUN within_ADP a_DET month_NOUN ._.
My_PRON grandmother_NOUN keeps_VERB her_PRON recipes_NOUN in_ADP a_DET blue_ADJ notebook_NOUN ._.
She_PRON measures_VERB nothing_PRON and_CONJ trusts_VERB her_PRON hands_NOUN ._.
The_DET dough_NOUN rests_VERB near_ADP the_DET stove_NOUN until_CONJ it_PRON doubles_VERB ._.
Onions_NOUN brown_VERB slowly_ADV in_ADP butter_NOUN while_CONJ the_DET broth_NOUN simmers_VERB ._.
Dinner_NOUN arrives_VERB late_ADV ,_. but_CONJ nobody_NOUN complains_VERB ._.
The_DET harbor_NOUN smelled_VERB of_ADP salt_NOUN and_CONJ diesel_NOUN ._.
Fishermen_NOUN unloaded_VERB crates_NOUN of_ADP silver_ADJ mackerel_NOUN ._.
Gulls_NOUN circled_VERB the_DET boats_NOUN and_CONJ screamed_VERB at_ADP the_DET crews_NOUN ._.
A_DET ferry_NOUN waited_VERB at_ADP the_DET far_ADJ pier_NOUN with_ADP its_PRON engines_NOUN running_VERB ._.
Tickets_NOUN for_ADP the_DET morning_NOUN crossing_NOUN sold_VERB quickly_ADV ._.
The_DET teacher_NOUN wrote_VERB a_DET long_ADJ equation_NOUN across_ADP the_DET board_NOUN ._.
Students_NOUN copied_VERB it_PRON carefully_ADV into_ADP their_PRON notebooks_NOUN ._.
One_NUM girl_NOUN spotted_VERB an_DET error_NOUN in_ADP the_DET third_NUM line_NOUN ._.
The_DET class_NOUN worked_VERB through_ADP the_DET proof_NOUN again_ADV from_ADP the_DET beginning_NOUN ._.
Nobody_NOUN minded_VERB when_CONJ the_DET bell_NOUN rang_VERB late_ADV ._.
The_DET factory_NOUN runs_VERB two_NUM shifts_NOUN in_ADP summer_NOUN ._.
Machines_NOUN stamp_VERB metal_NOUN panels_NOUN day_NOUN and_CONJ night_NOUN ._.
Inspectors_NOUN check_VERB every_DET tenth_ADJ panel_NOUN for_ADP cracks_NOUN ._.
A_DET single_ADJ flaw_NOUN stops_VERB the_DET whole_ADJ line_NOUN ._.
Managers_NOUN hate_VERB the_DET delays_NOUN but_CONJ accept_VERB the_DET rule_NOUN ._.
Tourists_NOUN crowded_VERB the_DET narrow_ADJ streets_NOUN of_ADP the_DET old_ADJ town_NOUN ._.
Vendors_NOUN sold_VERB painted_ADJ tiles_NOUN and_CONJ cheap_ADJ scarves_NOUN ._.
A_DET guide_NOUN raised_VERB her_PRON umbrella_NOUN and_CONJ counted_VERB heads_NOUN ._.
The_DET cathedral_NOUN bells_NOUN rang_VERB twice_ADV ,_. and_CONJ the_DET crowd_NOUN fell_VERB silent_ADJ ._.
Light_NOUN poured_VERB through_ADP the_DET stained_ADJ glass_NOUN onto_ADP the_DET stone_NOUN floor_NOUN ._.
The_DET striker_NOUN scored_VERB early_ADV ,_. and_CONJ the_DET stadium_NOUN erupted_VERB ._.
Defenders_NOUN pressed_VERB higher_ADV after_ADP the_DET break_NOUN ._.
A_DET careless_ADJ pass_NOUN cost_VERB them_PRON the_DET equalizer_NOUN ._.
The_DET referee_NOUN added_VERB four_NUM minutes_NOUN ,_. but_CONJ the_DET score_NOUN held_VERB ._.
Fans_NOUN sang_VERB in_ADP the_DET rain_NOUN long_ADV after_ADP the_DET whistle_NOUN ._.
The_DET clinic_NOUN opens_VERB at_ADP eight_NUM and_CONJ fills_VERB within_ADP an_DET hour_NOUN ._.
Nurses_NOUN triage_VERB patients_NOUN in_ADP the_DET hallway_NOUN ._.
A_DET child_NOUN with_ADP a_DET broken_ADJ wrist_NOUN waits_VERB quietly_ADV ._.
The_DET doctor_NOUN reads_VERB the_DET scan_NOUN and_CONJ frowns_VERB at_ADP the_DET screen_NOUN ._.
Treatment_NOUN starts_VERB the_DET same_ADJ afternoon_NOUN ._.
Prices_NOUN rose_VERB sharply_ADV in_ADP the_DET spring_NOUN ._.
Shoppers_NOUN switched_VERB to_PRT cheaper_ADJ brands_NOUN and_CONJ smaller_ADJ packages_NOUN ._.
Economists_NOUN blamed_VERB fuel_NOUN costs_NOUN and_CONJ a_DET weak_ADJ harvest_NOUN ._.
The_DET bank_NOUN raised_VERB rates_NOUN again_ADV in_ADP June_NOUN ._.
Few_ADJ analysts_NOUN expect_VERB relief_NOUN before_ADP autumn_NOUN ._.
The_DET orchestra_NOUN tuned_VERB quietly_ADV behind_ADP the_DET heavy_ADJ curtain_NOUN ._.
A_DET young_ADJ cellist_NOUN played_VERB her_PRON first_NUM solo_NOUN without_ADP a_DET mistake_NOUN ._.
The_DET conductor_NOUN smiled_VERB and_CONJ lowered_VERB his_PRON baton_NOUN ._.
Applause_NOUN rolled_VERB through_ADP the_DET hall_NOUN like_ADP thunder_NOUN ._.
Critics_NOUN called_VERB the_DET premiere_NOUN the_DET season_NOUN 's_PRT finest_ADJ hour_NOUN ._.
Wolves_NOUN returned_VERB to_PRT the_DET northern_ADJ forest_NOUN after_ADP decades_NOUN ._.
Rangers_NOUN tracked_VERB the_DET pack_NOUN with_ADP radio_NOUN collars_NOUN ._.
Farmers_NOUN worried_VERB about_ADP their_PRON sheep_NOUN and_CONJ demanded_VERB fences_NOUN ._.
Biologists_NOUN counted_VERB eleven_NUM pups_NOUN in_ADP the_DET second_NUM year_NOUN ._.
The_DET debate_NOUN continues_VERB in_ADP every_DET village_NOUN council_NOUN ._.
The_DET library_NOUN digitized_VERB ten_NUM thousand_NUM pages_NOUN of_ADP letters_NOUN ._.
Volunteers_NOUN transcribed_VERB the_DET faded_ADJ handwriting_NOUN ._.
Historians_NOUN found_VERB a_DET forgotten_ADJ diary_NOUN among_ADP the_DET files_NOUN ._.
Its_PRON author_NOUN described_VERB the_DET flood_NOUN of_ADP 1862_NUM in_ADP plain_ADJ language_NOUN ._.
The_DET archive_NOUN published_VERB the_DET scans_NOUN online_ADV for_ADP free_ADJ access_NOUN ._.
A_DET drone_NOUN surveyed_VERB the_DET burned_ADJ ridge_NOUN at_ADP dawn_NOUN ._.
Smoke_NOUN still_ADV rose_VERB from_ADP the_DET eastern_ADJ gullies_NOUN ._.
Crews_NOUN cut_VERB a_DET firebreak_NOUN along_ADP the_DET access_NOUN road_NOUN ._.
Helicopters_NOUN dropped_VERB water_NOUN on_ADP the_DET hottest_ADJ spots_NOUN ._.
By_ADP nightfall_NOUN the_DET perimeter_NOUN held_VERB ,_. and_CONJ the_DET wind_NOUN finally_ADV turned_VERB ._.
The_DET startup_NOUN rewrote_VERB its_PRON billing_NOUN code_NOUN over_ADP a_DET weekend_NOUN ._.
Two_NUM engineers_NOUN found_VERB a_DET subtle_ADJ bug_NOUN in_ADP the_DET tax_NOUN logic_NOUN ._.
Tests_NOUN caught_VERB a_DET rounding_NOUN error_NOUN before_ADP the_DET release_NOUN ._.
Customers_NOUN never_ADV noticed_VERB the_DET change_NOUN ._.
The_DET team_NOUN celebrated_VERB with_ADP cold_ADJ pizza_NOUN and_CONJ warm_ADJ soda_NOUN ._.
Her_PRON essay_NOUN compared_VERB two_NUM translations_NOUN of_ADP the_DET same_ADJ poem_NOUN ._.
The_DET older_ADJ version_NOUN kept_VERB the_DET meter_NOUN but_CONJ lost_VERB the_DET humor_NOUN ._.
The_DET newer_ADJ one_NUM read_VERB like_ADP prose_NOUN ._.
Her_PRON professor_NOUN scribbled_VERB questions_NOUN in_ADP the_DET margins_NOUN ._.
The_DET revision_NOUN took_VERB a_DET full_ADJ week_NOUN ,_. but_CONJ the_DET grade_NOUN justified_VERB it_PRON ._.
The_DET glacier_NOUN retreated_VERB forty_NUM meters_NOUN in_ADP a_DET single_ADJ decade_NOUN ._.
Melt_NOUN water_NOUN carved_VERB new_ADJ channels_NOUN through_ADP the_DET gravel_NOUN ._.
Climbers_NOUN now_ADV cross_VERB the_DET ice_NOUN before_ADP sunrise_NOUN ._.
A_DET research_NOUN hut_NOUN stands_VERB where_ADV the_DET tongue_NOUN once_ADV ended_VERB ._.
Instruments_NOUN record_VERB the_DET shrinking_NOUN every_DET hour_NOUN ._.
The_DET baker_NOUN 's_PRT daughter_NOUN runs_VERB the_DET shop_NOUN now_ADV ._.
She_PRON kept_VERB the_DET old_ADJ oven_NOUN and_CONJ the_DET recipes_NOUN ._.
Regulars_NOUN still_ADV argue_VERB about_ADP the_DET rye_NOUN loaf_NOUN ._.
On_ADP holidays_NOUN the_DET line_NOUN stretches_VERB past_ADP the_DET pharmacy_NOUN ._.
Nothing_PRON else_ADJ in_ADP town_NOUN smells_VERB half_ADV as_CONJ good_ADJ ._.
The_DET satellite_NOUN lost_VERB contact_NOUN over_ADP the_DET southern_ADJ ocean_NOUN ._.
Operators_NOUN cycled_VERB the_DET radio_NOUN and_CONJ waited_VERB ._.
Telemetry_NOUN returned_VERB after_ADP eleven_NUM tense_ADJ minutes_NOUN ._.
A_DET software_NOUN patch_NOUN fixed_VERB the_DET clock_NOUN drift_NOUN ._.
The_DET mission_NOUN continued_VERB as_CONJ planned_VERB ._.
"""


def main():
    out = []
    for line in SENTENCES.strip().splitlines():
        for tok in line.split():
            m = re.match(r"^(.+)_([A-Z.]+)$", tok)
            if not m:
                sys.exit(f"bad annotation: {tok}")
            w, t = m.group(1), m.group(2)
            lw = w.lower()
            if lw in LEXICON and LEXICON[lw] != t:
                sys.exit(f"closed-class violation: {w} tagged {t}, lexicon {LEXICON[lw]}")
            if not re.search(r"[A-Za-z0-9]", w) and t != ".":
                sys.exit(f"punctuation must be '.': {tok}")
            if re.fullmatch(r"[0-9]+([.,][0-9]+)*", w) and t != "NUM":
                sys.exit(f"digit token must be NUM: {tok}")
            out.append(f"{w}\t{t}")
    print("\n".join(out))
    sys.stderr.write(f"{len(out)} tokens validated\n")


if __name__ == "__main__":
    main()
