#!/usr/bin/env python3
"""One-shot builder for the round-18 pos_train.tsv extension.

The r18 gold extension (tools/pos_gold_extend_r18.py) widened the
held-out sample to 4,438 tokens and exposed the training corpus's
coverage ceiling: at 1,912 tokens the trained emission lexicon knows
358 word forms, and the dominant held-out error class is ordinary
open-class vocabulary the trainer has simply never seen (common
third-person verbs reading NOUN, -y/-est suffix misfires on everyday
nouns, weekday/month names reading ADJ). This extension roughly
doubles the training corpus with fresh builder-authored prose —
NATURAL text across new domains, annotated under the same closed-class
conventions, disjoint from both the existing training sentences and
the gold file's sentences. The vocabulary is deliberately ordinary
(days, months, common verbs in several inflections, everyday nouns);
no gold sentence or gold-only rare word is copied.

Validator contract identical to tools/pos_gold_extend.py.

Usage: python3 tools/pos_train_extend_r18.py >> fixtures/pos_train.tsv
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
The_DET shop_NOUN opens_VERB at_ADP nine_NUM on_ADP Monday_NOUN ._.
It_PRON closes_VERB early_ADV on_ADP Friday_NOUN ._.
The_DET office_NOUN checks_VERB the_DET mail_NOUN twice_ADV a_DET day_NOUN ._.
A_DET clerk_NOUN sorts_VERB the_DET letters_NOUN into_ADP gray_ADJ trays_NOUN ._.
The_DET river_NOUN flows_VERB south_ADV past_ADP the_DET mill_NOUN ._.
A_DET rope_NOUN hangs_VERB from_ADP the_DET oak_NOUN branch_NOUN ._.
The_DET cook_NOUN stirs_VERB the_DET pot_NOUN and_CONJ tastes_VERB the_DET soup_NOUN ._.
She_PRON cooks_VERB lunch_NOUN for_ADP the_DET whole_ADJ crew_NOUN ._.
The_DET store_NOUN sells_VERB tools_NOUN and_CONJ seed_NOUN ._.
It_PRON stores_VERB the_DET surplus_NOUN in_ADP the_DET cellar_NOUN ._.
My_PRON sister_NOUN handles_VERB the_DET accounts_NOUN ._.
She_PRON draws_VERB a_DET neat_ADJ line_NOUN under_ADP each_DET total_NOUN ._.
The_DET dog_NOUN trusts_VERB the_DET postman_NOUN now_ADV ._.
Our_PRON cousin_NOUN farms_VERB the_DET low_ADJ fields_NOUN by_ADP the_DET river_NOUN ._.
A_DET tarp_NOUN covers_VERB the_DET woodpile_NOUN in_ADP winter_NOUN ._.
The_DET ladder_NOUN reaches_VERB the_DET second_NUM floor_NOUN ._.
A_DET line_NOUN of_ADP carts_NOUN queues_VERB at_ADP the_DET weighbridge_NOUN ._.
The_DET sled_NOUN slides_VERB down_PRT the_DET icy_ADJ lane_NOUN ._.
The_DET cat_NOUN hides_VERB behind_ADP the_DET curtain_NOUN ._.
He_PRON finds_VERB his_PRON keys_NOUN under_ADP the_DET couch_NOUN ._.
She_PRON lights_VERB the_DET stove_NOUN before_ADP breakfast_NOUN ._.
The_DET moon_NOUN rises_VERB over_ADP the_DET barn_NOUN ._.
Smoke_NOUN rose_VERB from_ADP the_DET chimney_NOUN all_DET evening_NOUN ._.
We_PRON found_VERB a_DET nest_NOUN in_ADP the_DET hedge_NOUN ._.
The_DET boy_NOUN hid_VERB the_DET marbles_NOUN in_ADP a_DET sock_NOUN ._.
She_PRON lit_VERB a_DET candle_NOUN and_CONJ read_VERB until_CONJ ten_NUM ._.
He_PRON writes_VERB letters_NOUN every_DET Sunday_NOUN ._.
The_DET bell_NOUN rings_VERB at_ADP noon_NOUN ._.
The_DET old_ADJ bridge_NOUN stands_VERB on_ADP stone_NOUN piers_NOUN ._.
A_DET narrow_ADJ path_NOUN leads_VERB to_PRT the_DET spring_NOUN ._.
The_DET guide_NOUN counts_VERB the_DET hikers_NOUN at_ADP every_DET gate_NOUN ._.
The_DET bus_NOUN waits_VERB five_NUM minutes_NOUN at_ADP the_DET square_NOUN ._.
The_DET rain_NOUN stops_VERB before_ADP dawn_NOUN ._.
The_DET engine_NOUN starts_VERB on_ADP the_DET third_NUM try_NOUN ._.
The_DET band_NOUN plays_VERB in_ADP the_DET park_NOUN on_ADP Saturday_NOUN ._.
The_DET family_NOUN moves_VERB to_PRT the_DET coast_NOUN in_ADP June_NOUN ._.
Her_PRON aunt_NOUN lives_VERB above_ADP the_DET bakery_NOUN ._.
The_DET fire_NOUN dies_VERB down_PRT after_ADP midnight_NOUN ._.
The_DET baby_NOUN eats_VERB early_ADV and_CONJ sleeps_VERB late_ADV ._.
He_PRON drinks_VERB his_PRON coffee_NOUN black_ADJ ._.
She_PRON wakes_VERB before_ADP the_DET alarm_NOUN ._.
The_DET mason_NOUN builds_VERB the_DET wall_NOUN a_DET course_NOUN a_DET day_NOUN ._.
Frost_NOUN breaks_VERB the_DET weak_ADJ mortar_NOUN ._.
The_DET plumber_NOUN fixes_VERB the_DET leak_NOUN in_ADP an_DET hour_NOUN ._.
A_DET machine_NOUN washes_VERB the_DET bottles_NOUN ._.
The_DET crew_NOUN paints_VERB the_DET hull_NOUN every_DET spring_NOUN ._.
The_DET manager_NOUN signs_VERB the_DET orders_NOUN after_ADP lunch_NOUN ._.
The_DET firm_NOUN sends_VERB invoices_NOUN on_ADP Tuesday_NOUN ._.
The_DET clerk_NOUN receives_VERB the_DET parcels_NOUN at_ADP the_DET side_NOUN door_NOUN ._.
He_PRON pays_VERB the_DET rent_NOUN in_ADP cash_NOUN ._.
She_PRON owes_VERB the_DET library_NOUN a_DET small_ADJ fine_NOUN ._.
The_DET stall_NOUN earns_VERB more_ADV in_ADP August_NOUN than_CONJ in_ADP March_NOUN ._.
He_PRON spends_VERB his_PRON evenings_NOUN in_ADP the_DET garden_NOUN ._.
She_PRON saves_VERB a_DET tenth_NOUN of_ADP every_DET wage_NOUN ._.
The_DET team_NOUN loses_VERB at_ADP home_NOUN and_CONJ wins_VERB away_PRT ._.
The_DET bill_NOUN fails_VERB in_ADP the_DET senate_NOUN again_ADV ._.
The_DET road_NOUN passes_VERB the_DET quarry_NOUN and_CONJ climbs_VERB the_DET ridge_NOUN ._.
He_PRON teaches_VERB history_NOUN at_ADP the_DET upper_ADJ school_NOUN ._.
She_PRON learns_VERB a_DET new_ADJ chord_NOUN each_DET week_NOUN ._.
The_DET student_NOUN studies_VERB at_ADP the_DET rear_NOUN of_ADP the_DET cafe_NOUN ._.
The_DET couple_NOUN argues_VERB about_ADP paint_NOUN colors_NOUN ._.
The_DET committee_NOUN agrees_VERB on_ADP nothing_PRON before_ADP coffee_NOUN ._.
The_DET landlord_NOUN refuses_VERB every_DET repair_NOUN at_ADP first_NUM ._.
He_PRON accepts_VERB the_DET offer_NOUN on_ADP Friday_NOUN ._.
The_DET hotel_NOUN offers_VERB a_DET plain_ADJ room_NOUN and_CONJ a_DET good_ADJ view_NOUN ._.
The_DET child_NOUN asks_VERB the_DET same_ADJ riddle_NOUN twice_ADV ._.
The_DET teacher_NOUN answers_VERB with_ADP a_DET grin_NOUN ._.
The_DET nurse_NOUN calls_VERB the_DET next_ADJ name_NOUN ._.
Her_PRON uncle_NOUN visits_VERB in_ADP October_NOUN ._.
The_DET club_NOUN meets_VERB in_ADP the_DET old_ADJ chapel_NOUN ._.
A_DET new_ADJ member_NOUN joins_VERB every_DET month_NOUN ._.
The_DET ferry_NOUN departs_VERB at_ADP six_NUM ._.
The_DET swallows_NOUN return_VERB in_ADP April_NOUN ._.
The_DET fog_NOUN stays_VERB in_ADP the_DET valley_NOUN until_CONJ noon_NOUN ._.
The_DET stain_NOUN remains_VERB after_ADP two_NUM washes_NOUN ._.
The_DET town_NOUN grows_VERB toward_ADP the_DET highway_NOUN ._.
The_DET lake_NOUN shrinks_VERB every_DET summer_NOUN ._.
The_DET rumor_NOUN spreads_VERB faster_ADV than_CONJ the_DET news_NOUN ._.
The_DET choir_NOUN gathers_VERB in_ADP the_DET vestry_NOUN ._.
He_PRON collects_VERB old_ADJ maps_NOUN of_ADP the_DET coast_NOUN ._.
She_PRON shares_VERB her_PRON notes_NOUN with_ADP the_DET class_NOUN ._.
The_DET trail_NOUN divides_VERB at_ADP the_DET cairn_NOUN ._.
The_DET cook_NOUN adds_VERB salt_NOUN at_ADP the_DET end_NOUN ._.
The_DET barber_NOUN removes_VERB the_DET towel_NOUN with_ADP a_DET flourish_NOUN ._.
The_DET crane_NOUN lifts_VERB the_DET beam_NOUN over_ADP the_DET fence_NOUN ._.
The_DET captain_NOUN lowers_VERB the_DET sail_NOUN before_ADP the_DET squall_NOUN ._.
The_DET baker_NOUN raises_VERB the_DET price_NOUN of_ADP rolls_NOUN ._.
The_DET gull_NOUN drops_VERB the_DET clam_NOUN on_ADP the_DET rocks_NOUN ._.
The_DET anchor_NOUN holds_VERB in_ADP the_DET sandy_ADJ bottom_NOUN ._.
He_PRON pulls_VERB the_DET cart_NOUN and_CONJ she_PRON pushes_VERB ._.
The_DET porter_NOUN carries_VERB the_DET trunks_NOUN upstairs_ADV ._.
The_DET mare_NOUN turns_VERB at_ADP the_DET gate_NOUN without_ADP a_DET word_NOUN ._.
The_DET path_NOUN runs_VERB along_ADP the_DET old_ADJ canal_NOUN ._.
He_PRON walks_VERB to_PRT work_NOUN in_ADP every_DET weather_NOUN ._.
The_DET clock_NOUN loses_VERB a_DET minute_NOUN a_DET week_NOUN ._.
She_PRON sits_VERB by_ADP the_DET window_NOUN with_ADP her_PRON knitting_NOUN ._.
The_DET judge_NOUN reads_VERB the_DET verdict_NOUN slowly_ADV ._.
The_DET miller_NOUN went_VERB to_PRT town_NOUN on_ADP Wednesday_NOUN ._.
She_PRON came_VERB home_ADV before_ADP the_DET storm_NOUN ._.
He_PRON saw_VERB the_DET comet_NOUN from_ADP the_DET roof_NOUN ._.
The_DET thief_NOUN took_VERB nothing_PRON but_CONJ the_DET silver_NOUN spoon_NOUN ._.
She_PRON gave_VERB the_DET beggar_NOUN her_PRON gloves_NOUN ._.
The_DET tailor_NOUN made_VERB the_DET coat_NOUN in_ADP three_NUM days_NOUN ._.
Grandfather_NOUN knew_VERB every_DET path_NOUN in_ADP the_DET forest_NOUN ._.
Nobody_NOUN thought_VERB the_DET plan_NOUN would_VERB work_VERB ._.
She_PRON felt_VERB the_DET first_NUM drops_NOUN of_ADP rain_NOUN ._.
He_PRON left_VERB the_DET party_NOUN before_ADP the_DET toasts_NOUN ._.
She_PRON kept_VERB the_DET ticket_NOUN as_CONJ a_DET bookmark_NOUN ._.
The_DET sergeant_NOUN held_VERB the_DET lantern_NOUN high_ADV ._.
The_DET mill_NOUN stood_VERB empty_ADJ for_ADP ten_NUM years_NOUN ._.
The_DET children_NOUN ran_VERB to_PRT the_DET shore_NOUN ._.
The_DET jury_NOUN sat_VERB through_ADP a_DET long_ADJ afternoon_NOUN ._.
The_DET mare_NOUN won_VERB the_DET fair_NOUN 's_PRT last_ADJ race_NOUN ._.
The_DET captain_NOUN lost_VERB his_PRON hat_NOUN to_PRT the_DET wind_NOUN ._.
The_DET cousins_NOUN met_VERB at_ADP the_DET crossroads_NOUN ._.
The_DET widow_NOUN sent_VERB cakes_NOUN to_PRT the_DET harvest_NOUN dance_NOUN ._.
He_PRON spent_VERB the_DET summer_NOUN mending_VERB nets_NOUN ._.
The_DET guild_NOUN built_VERB the_DET hall_NOUN in_ADP a_DET single_ADJ year_NOUN ._.
She_PRON bought_VERB ribbon_NOUN and_CONJ thread_NOUN at_ADP the_DET fair_NOUN ._.
He_PRON brought_VERB firewood_NOUN from_ADP the_DET north_ADJ lot_NOUN ._.
The_DET boy_NOUN caught_VERB a_DET trout_NOUN with_ADP his_PRON hands_NOUN ._.
Her_PRON mother_NOUN taught_VERB the_DET village_NOUN choir_NOUN ._.
The_DET brothers_NOUN fought_VERB about_ADP the_DET fence_NOUN line_NOUN ._.
The_DET farm_NOUN sold_VERB honey_NOUN at_ADP the_DET gate_NOUN ._.
The_DET elder_NOUN told_VERB the_DET story_NOUN again_ADV at_ADP the_DET feast_NOUN ._.
The_DET watchman_NOUN heard_VERB hooves_NOUN on_ADP the_DET bridge_NOUN ._.
The_DET clerk_NOUN wrote_VERB the_DET names_NOUN in_ADP a_DET green_ADJ book_NOUN ._.
She_PRON rode_VERB the_DET gray_ADJ mare_NOUN to_PRT market_NOUN ._.
He_PRON drove_VERB the_DET cattle_NOUN through_ADP the_DET ford_NOUN ._.
The_DET heron_NOUN flew_VERB low_ADV over_ADP the_DET reeds_NOUN ._.
The_DET child_NOUN drew_VERB a_DET ship_NOUN on_ADP the_DET steamed_ADJ glass_NOUN ._.
The_DET pitcher_NOUN threw_VERB wide_ADV twice_ADV ._.
The_DET vine_NOUN grew_VERB over_ADP the_DET porch_NOUN in_ADP a_DET season_NOUN ._.
The_DET wind_NOUN blew_VERB the_DET gate_NOUN shut_ADJ ._.
She_PRON wore_VERB her_PRON mother_NOUN 's_PRT ring_NOUN ._.
The_DET sail_NOUN tore_VERB along_ADP the_DET old_ADJ seam_NOUN ._.
The_DET council_NOUN chose_VERB the_DET cheaper_ADJ design_NOUN ._.
The_DET pond_NOUN froze_VERB solid_ADJ by_ADP January_NOUN ._.
The_DET mayor_NOUN spoke_VERB for_ADP an_DET hour_NOUN ._.
The_DET axle_NOUN broke_VERB on_ADP the_DET last_ADJ hill_NOUN ._.
A_DET magpie_NOUN stole_VERB the_DET ring_NOUN from_ADP the_DET sill_NOUN ._.
The_DET village_NOUN woke_VERB to_PRT deep_ADJ snow_NOUN ._.
He_PRON paid_VERB the_DET ferryman_NOUN with_ADP apples_NOUN ._.
She_PRON laid_VERB the_DET table_NOUN for_ADP nine_NUM ._.
The_DET money_NOUN sits_VERB in_ADP a_DET tin_NOUN above_ADP the_DET stove_NOUN ._.
The_DET journey_NOUN takes_VERB two_NUM days_NOUN by_ADP cart_NOUN ._.
The_DET city_NOUN feels_VERB far_ADJ from_ADP the_DET orchard_NOUN ._.
The_DET factory_NOUN whistle_NOUN marks_VERB the_DET hours_NOUN ._.
The_DET company_NOUN owns_VERB the_DET dock_NOUN and_CONJ the_DET cranes_NOUN ._.
The_DET country_NOUN road_NOUN turns_VERB to_PRT mud_NOUN in_ADP November_NOUN ._.
The_DET history_NOUN of_ADP the_DET valley_NOUN fills_VERB three_NUM shelves_NOUN ._.
The_DET library_NOUN keeps_VERB the_DET oldest_ADJ deed_NOUN in_ADP a_DET drawer_NOUN ._.
Her_PRON story_NOUN begins_VERB on_ADP a_DET ferry_NOUN in_ADP December_NOUN ._.
The_DET attic_NOUN smells_VERB of_ADP apples_NOUN and_CONJ dust_NOUN ._.
The_DET kettle_NOUN sings_VERB on_ADP the_DET hob_NOUN ._.
The_DET floor_NOUN creaks_VERB under_ADP the_DET third_NUM step_NOUN ._.
The_DET hinge_NOUN wants_VERB oil_NOUN ._.
The_DET roof_NOUN leaks_VERB over_ADP the_DET pantry_NOUN ._.
The_DET chimney_NOUN draws_VERB well_ADV in_ADP a_DET west_ADJ wind_NOUN ._.
The_DET cistern_NOUN dries_VERB in_ADP July_NOUN ._.
The_DET garden_NOUN yields_VERB beans_NOUN and_CONJ envy_NOUN ._.
The_DET bees_NOUN swarm_VERB in_ADP the_DET pear_NOUN tree_NOUN ._.
The_DET fox_NOUN crosses_VERB the_DET yard_NOUN at_ADP dusk_NOUN ._.
The_DET owl_NOUN hunts_VERB along_ADP the_DET hedgerow_NOUN ._.
The_DET dog_NOUN barks_VERB at_ADP the_DET thunder_NOUN ._.
The_DET horse_NOUN shies_VERB at_ADP paper_NOUN ._.
The_DET goat_NOUN climbs_VERB onto_ADP the_DET shed_NOUN roof_NOUN ._.
The_DET hens_NOUN scatter_VERB when_CONJ the_DET hawk_NOUN circles_VERB ._.
The_DET tide_NOUN lifts_VERB the_DET boats_NOUN at_ADP four_NUM ._.
The_DET current_NOUN carries_VERB the_DET raft_NOUN past_ADP the_DET weir_NOUN ._.
The_DET storm_NOUN bends_VERB the_DET poplars_NOUN ._.
The_DET heat_NOUN cracks_VERB the_DET clay_NOUN ._.
The_DET frost_NOUN sweetens_VERB the_DET parsnips_NOUN ._.
The_DET drought_NOUN tests_VERB the_DET old_ADJ wells_NOUN ._.
The_DET flood_NOUN leaves_VERB silt_NOUN on_ADP the_DET meadow_NOUN ._.
The_DET harvest_NOUN depends_VERB on_ADP the_DET next_ADJ rain_NOUN ._.
The_DET market_NOUN opens_VERB before_ADP light_NOUN on_ADP Thursday_NOUN ._.
The_DET auction_NOUN ends_VERB when_CONJ the_DET bell_NOUN sounds_VERB ._.
The_DET price_NOUN of_ADP wool_NOUN falls_VERB again_ADV ._.
The_DET money_NOUN changes_VERB hands_NOUN under_ADP the_DET clock_NOUN ._.
The_DET notary_NOUN seals_VERB the_DET deed_NOUN with_ADP red_ADJ wax_NOUN ._.
The_DET heir_NOUN contests_VERB the_DET estate_NOUN in_ADP February_NOUN ._.
The_DET court_NOUN hears_VERB the_DET case_NOUN in_ADP September_NOUN ._.
The_DET lawyer_NOUN cites_VERB a_DET ruling_NOUN from_ADP 1907_NUM ._.
The_DET witness_NOUN swears_VERB on_ADP the_DET worn_ADJ bible_NOUN ._.
The_DET fine_NOUN costs_VERB him_PRON a_DET week_NOUN 's_PRT wages_NOUN ._.
The_DET doctor_NOUN visits_VERB the_DET farms_NOUN by_ADP bicycle_NOUN ._.
The_DET fever_NOUN passes_VERB in_ADP three_NUM days_NOUN ._.
The_DET chemist_NOUN mixes_VERB the_DET tonic_NOUN himself_PRON ._.
The_DET midwife_NOUN knows_VERB every_DET birthday_NOUN in_ADP the_DET parish_NOUN ._.
The_DET priest_NOUN rings_VERB the_DET bell_NOUN himself_PRON on_ADP Sunday_NOUN ._.
The_DET organist_NOUN practices_VERB on_ADP Tuesday_NOUN evenings_NOUN ._.
The_DET sexton_NOUN mows_VERB the_DET churchyard_NOUN in_ADP April_NOUN ._.
The_DET painter_NOUN mixes_VERB the_DET blue_ADJ himself_PRON ._.
The_DET sketch_NOUN shows_VERB the_DET harbor_NOUN at_ADP low_ADJ tide_NOUN ._.
The_DET frame_NOUN costs_VERB more_ADV than_CONJ the_DET picture_NOUN ._.
The_DET gallery_NOUN hangs_VERB the_DET portrait_NOUN near_ADP the_DET door_NOUN ._.
The_DET critic_NOUN writes_VERB kindly_ADV for_ADP once_ADV ._.
The_DET sitter_NOUN hates_VERB her_PRON own_ADJ smile_NOUN ._.
The_DET apprentice_NOUN grinds_VERB the_DET colors_NOUN at_ADP dawn_NOUN ._.
The_DET teacher_NOUN marks_VERB the_DET essays_NOUN by_ADP candlelight_NOUN ._.
The_DET school_NOUN closes_VERB for_ADP the_DET harvest_NOUN ._.
The_DET inspector_NOUN praises_VERB the_DET neat_ADJ rows_NOUN ._.
The_DET pupils_NOUN recite_VERB the_DET kings_NOUN in_ADP order_NOUN ._.
The_DET smallest_ADJ boy_NOUN knows_VERB the_DET dates_NOUN best_ADV ._.
The_DET bell_NOUN rope_NOUN wears_VERB thin_ADJ by_ADP spring_NOUN ._.
The_DET blacksmith_NOUN shoes_VERB the_DET mare_NOUN before_ADP the_DET frost_NOUN ._.
The_DET forge_NOUN glows_VERB into_ADP the_DET evening_NOUN ._.
The_DET anvil_NOUN rings_VERB across_ADP the_DET lane_NOUN ._.
The_DET wheelwright_NOUN trues_VERB the_DET rim_NOUN by_ADP eye_NOUN ._.
The_DET cooper_NOUN bends_VERB the_DET staves_NOUN over_ADP steam_NOUN ._.
The_DET tanner_NOUN works_VERB downwind_ADV of_ADP the_DET village_NOUN ._.
The_DET weaver_NOUN threads_VERB the_DET loom_NOUN before_ADP sunrise_NOUN ._.
The_DET shepherd_NOUN counts_VERB the_DET flock_NOUN at_ADP the_DET stile_NOUN ._.
The_DET drover_NOUN rests_VERB the_DET herd_NOUN at_ADP the_DET green_NOUN ._.
The_DET carter_NOUN greases_VERB the_DET axles_NOUN on_ADP Saturday_NOUN ._.
The_DET ferry_NOUN carries_VERB eight_NUM carts_NOUN at_ADP a_DET crossing_NOUN ._.
The_DET toll_NOUN pays_VERB for_ADP the_DET new_ADJ planks_NOUN ._.
The_DET innkeeper_NOUN waters_VERB the_DET wine_NOUN ,_. they_PRON say_VERB ._.
The_DET fiddler_NOUN plays_VERB until_CONJ the_DET candles_NOUN gutter_VERB ._.
The_DET dancers_NOUN rest_VERB between_ADP the_DET reels_NOUN ._.
The_DET landlady_NOUN airs_VERB the_DET rooms_NOUN on_ADP washing_NOUN day_NOUN ._.
The_DET traveler_NOUN asks_VERB for_ADP the_DET coast_NOUN road_NOUN ._.
The_DET signpost_NOUN points_VERB three_NUM ways_NOUN and_CONJ lies_VERB twice_ADV ._.
The_DET map_NOUN shows_VERB a_DET ford_NOUN that_DET the_DET flood_NOUN moved_VERB ._.
The_DET miles_NOUN pass_VERB slowly_ADV after_ADP noon_NOUN ._.
The_DET inn_NOUN appears_VERB at_ADP the_DET bend_NOUN like_ADP a_DET promise_NOUN ._.
The_DET fire_NOUN warms_VERB the_DET whole_ADJ room_NOUN ._.
The_DET supper_NOUN tastes_VERB of_ADP thyme_NOUN and_CONJ smoke_NOUN ._.
The_DET bed_NOUN costs_VERB extra_ADJ with_ADP clean_ADJ sheets_NOUN ._.
The_DET morning_NOUN comes_VERB too_ADV soon_ADV ._.
The_DET boots_NOUN dry_VERB by_ADP the_DET grate_NOUN overnight_ADV ._.
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
